"""Operator library: relational, merge, quality, audit, dedup, similarity.

Each module exposes DataFrame→DataFrame builders (lazy plans). Nothing
here collects; actions belong to callers and sinks.
"""
