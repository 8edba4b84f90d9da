"""Physical-plan introspection: summarize an executed plan's shape so
plan-quality gates can assert on structure instead of string-grepping
explain output ad hoc.

The summary feeds two consumers: the plan-hygiene tests (a refactor
that silently adds an exchange to a scan-local operator, drops a
broadcast, or loses parquet pushdown fails CI), and PLANS.md's audit
workflow. Parsing the *formatted* explain text is deliberate — it is
the one stable, public rendering of the physical plan across Spark
versions; private plan-node APIs churn.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanSummary:
    n_exchanges: int          # shuffle boundaries (excl. broadcast exchanges)
    n_broadcast_exchanges: int
    n_broadcast_hash_joins: int
    n_sort_merge_joins: int
    n_scans: int
    pushed_filters: tuple[str, ...]   # non-empty PushedFilters lines
    codegen_spans: int        # WholeStageCodegen regions

    @property
    def shuffle_free(self) -> bool:
        return self.n_exchanges == 0


def plan_summary(df: DataFrame) -> PlanSummary:
    """Parse ``df.explain('formatted')`` into a structural summary.

    Node names are counted from the numbered operator tree (the
    ``(n) OperatorName`` lines), so each physical operator counts ONCE —
    naive substring counts double-count the detail section below the
    tree.
    """
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # codegen regions only render in the SIMPLE mode tree (the `*(id)`
    # stars); formatted mode omits them under AQE
    sbuf = io.StringIO()
    with redirect_stdout(sbuf):
        df.explain()
    simple = sbuf.getvalue()
    tree = []
    for line in text.splitlines():
        m = re.match(r"\s*[*+:\-\s]*\((\d+)\)\s+([A-Za-z0-9_]+)", line)
        if m:
            tree.append(m.group(2))
    pushed = tuple(
        ln.strip() for ln in text.splitlines()
        if "PushedFilters" in ln and "PushedFilters: []" not in ln
    )
    return PlanSummary(
        n_exchanges=sum(1 for n in tree if n == "Exchange"),
        n_broadcast_exchanges=sum(1 for n in tree if n == "BroadcastExchange"),
        n_broadcast_hash_joins=sum(1 for n in tree if n == "BroadcastHashJoin"),
        n_sort_merge_joins=sum(1 for n in tree if n == "SortMergeJoin"),
        # 'Scan' ANYWHERE in the name: v1 file scans ('Scan parquet'),
        # DSv2 ('BatchScan'), and local frames ('LocalTableScan') all
        # count — startswith missed everything but v1
        n_scans=sum(1 for n in tree if "Scan" in n),
        pushed_filters=pushed,
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", simple))),
    )
