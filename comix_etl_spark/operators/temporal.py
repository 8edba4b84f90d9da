"""Temporal join operators Spark lacks natively: as-of join and
point-in-interval range join (SURVEY.md §7 extensions; the two named
examples of "operators the engine must compose from primitives").

Both avoid the naive O(|L|·|R|) theta-join:

- **as-of** — union both sides into one (key, ts)-ordered stream and
  carry the latest right-side values forward with a running window
  aggregate: ONE shuffle on the key, linear work, no pairwise blowup.
  This is the standard distributed formulation (kdb's aj / pandas
  merge_asof semantics, backward direction, inclusive).
- **range join** — explode each interval into the fixed-width time bins
  it covers, map each point to its bin, equi-join on the bin, then
  exact-filter the boundaries. Work is O(|points| + |intervals|·bins
  per interval + |true matches|) instead of |points|·|intervals|; bin
  width tunes the replication/selectivity trade-off (≈ median interval
  length is a good default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Sequence[str], tiebreak_col: str | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: every left row gains the ``value_cols`` of its
    nearest right row in the given ``direction`` — "backward" = latest
    right with ``right.ts <= left.ts`` (price-at-trade), "forward" =
    earliest right with ``right.ts >= left.ts`` (next-event attribution).
    NULL when no such row exists (left-outer semantics).

    Ties on the right timestamp resolve to the greatest
    ``tiebreak_col`` (required to be deterministic when right can hold
    equal timestamps per key). Plan: union the tagged sides, one window
    over (key) ordered by (ts, side) carrying a struct extreme forward —
    forward direction just flips the scan order (ts desc) and negates
    the struct's time key so the same lexicographic max picks the
    EARLIEST candidate. One shuffle total either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, not {direction!r}")
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")
    tb: Column = F.col(tiebreak_col) if tiebreak_col else F.lit(0)

    fwd = direction == "forward"
    # struct key: forward negates the epoch so max() = earliest ts
    tkey = (-F.unix_micros(F.col(right_ts).cast("timestamp")) if fwd
            else F.unix_micros(F.col(right_ts).cast("timestamp")))
    l_tag = left.withColumn("_is_left", F.lit(1))
    r_tag = right.select(
        *key,
        F.col(right_ts).alias(left_ts),
        F.struct(tkey.alias("_t"), tb.alias("_tb"),
                 *[F.col(c) for c in value_cols]).alias("_rv"),
    ).withColumn("_is_left", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows sort BEFORE left rows at equal ts (INCLUSIVE match in
    # both directions); struct max = (time key, tiebreak) lexicographic
    # → deterministic winner
    w = (Window.partitionBy(*key)
         .orderBy(F.col(left_ts).desc() if fwd else F.col(left_ts).asc(),
                  F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    best = F.max("_rv").over(w)
    # a NULL left timestamp must stay UNMATCHED in both directions:
    # under desc ordering (forward) NULLs sort last, so the frame would
    # otherwise hand them the globally earliest right row
    matched = F.col(left_ts).isNotNull()
    out = (u.withColumn("_best", best)
           .filter(F.col("_is_left") == 1)
           .select(*left.columns,
                   *[F.when(matched, F.col(f"_best.{c}")).alias(c)
                     for c in value_cols]))
    return out


def range_join_points_intervals(points: DataFrame, intervals: DataFrame, *,
                                point_col: str, start_col: str, end_col: str,
                                bin_seconds: int) -> DataFrame:
    """Inner join of points to every interval containing them
    (``start <= p <= end``, inclusive) without a cross product.

    Intervals explode into the ``bin_seconds``-wide epoch bins they
    overlap; points hash to their single bin; the join is a plain
    equi-join on the bin followed by the exact boundary filter. An
    interval spanning B bins appears B times pre-filter — choose
    ``bin_seconds`` near the typical interval length so B stays small.
    """
    def _bin(c: str) -> Column:
        # cast("timestamp") tolerates TIMESTAMP_NTZ inputs (unix_micros
        # rejects them); the session TZ is pinned UTC so the mapping is
        # exact and identical for both sides
        return F.floor(F.unix_micros(F.col(c).cast("timestamp")) / (bin_seconds * 1_000_000))

    p_bin, s_bin, e_bin = _bin(point_col), _bin(start_col), _bin(end_col)

    # NULL-bounded intervals pass the guard (Spark's assert_true raises
    # on NULL conditions, which would kill the job with a misleading
    # "reversed" message) and then drop naturally: sequence(s, NULL) is
    # NULL and explode emits nothing — the pre-guard behavior.
    checked_e_bin = F.when(
        F.assert_true(s_bin.isNull() | e_bin.isNull() | (s_bin <= e_bin),
                      F.lit(f"range_join_points_intervals: {end_col} < "
                            f"{start_col} (reversed interval)")).isNull(),
        e_bin)
    pts = points.withColumn("_bin", p_bin)
    ivs = intervals.withColumn("_bin",
                               F.explode(F.sequence(s_bin, checked_e_bin)))
    joined = pts.join(ivs, "_bin").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
    return joined.drop("_bin")


def gap_fill_daily(df: DataFrame, *, key: str, ts_col: str, value_col: str,
                   filled_col: str = "filled_value") -> DataFrame:
    """Dense daily calendar per key with forward-filled values — the
    standard time-series regularization step before feature windows
    (the reference's monthly bucket rollup, `etl/etl.py:70-80`, assumes
    dense periods; this op manufactures that density).

    Plan: aggregate to (key, day), look up each row's successor day with
    ``lead`` (one window on the key), then explode
    ``sequence(day, next_day - 1)`` so every observed row EMITS its own
    fill-forward range — no calendar table, no join, no second pass.
    Two exchanges total: the (key, day) aggregate and the key-ordered
    window; the explode is scan-local. Output size is sum(span_days) per
    key, independent of event count — safe when spans are bounded
    (days-per-key, not rows), which is the contract.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (df.select(F.col(key), day, F.col(value_col))
             .groupBy(key, "day")
             .agg(F.sum(F.col(value_col).cast("decimal(18,4)"))
                  .cast("double").alias("day_value")))
    w = Window.partitionBy(key).orderBy("day")
    ranged = daily.withColumn("_until",
                              F.coalesce(F.date_sub(F.lead("day").over(w), 1),
                                         F.col("day")))
    return (ranged
            .select(F.col(key), F.col("day_value"), F.col("day").alias("_src"),
                    F.explode(F.sequence("day", "_until")).alias("day"))
            .select(F.col(key), F.col("day"),
                    F.col("day_value").alias(filled_col),
                    (F.col("day") != F.col("_src")).cast("int").alias("is_gap")))


def interval_overlap_pairs(df: DataFrame, *, id_col: str, start_col: str,
                           end_col: str, group_cols: Sequence[str] = (),
                           cell_days: int | None = None) -> DataFrame:
    """All overlapping interval pairs (id_a < id_b) with their overlap
    length in whole days — the interval-INTERVAL join (sibling of
    range_join_points_intervals' point-in-interval). Start/end are
    timestamp columns, inclusive on both ends; overlap_days counts the
    shared days (≥ 1 for any true overlap).

    Scale shape: a naive formulation is an O(n²) theta-join. Here the
    equi-join key is ``group_cols`` plus (when ``cell_days`` is set) a
    time-grid cell each interval explodes onto, so candidate pairs are
    bounded per (group, cell) — the standard distributed interval-join
    recipe (what Databricks' range-join "bin" hint and PostGIS grid
    joins do). Each true pair is emitted EXACTLY ONCE without any
    dedup shuffle: a pair is evaluated only in the cell containing the
    LATER of the two starts (both intervals provably cover that cell,
    and only one cell contains a given day)."""
    g = list(group_cols)
    # floor over MICROSECONDS: unix_timestamp() itself truncates
    # sub-second parts toward zero, so 1969-12-31T23:59:59.5 would
    # read as second 0 → day 0 and falsely overlap 1970-01-01; the
    # unix_micros form keeps the fraction so the floor lands on day -1
    # (same idiom as range_join_points_intervals' binning)
    day = lambda c: F.floor(  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / 86_400_000_000)
    # a reversed interval (end < start) would silently emit pairs with
    # NEGATIVE overlap_days (both overlap predicates pass) — fail loud
    # NULL-bounded rows pass the guard (assert_true raises on NULL) and
    # are dropped by the join predicates / cell explode downstream —
    # same contract as range_join_points_intervals above.
    checked_e = F.when(
        F.assert_true(day(start_col).isNull() | day(end_col).isNull()
                      | (day(start_col) <= day(end_col)),
                      F.lit(f"interval_overlap_pairs: {end_col} < "
                            f"{start_col} (reversed interval)")).isNull(),
        day(end_col))
    base = df.select(*g, F.col(id_col).alias("_id"),
                     day(start_col).alias("_s"), checked_e.alias("_e"))
    if cell_days:
        cells = F.sequence(F.expr(f"floor(_s / {cell_days})"),
                           F.expr(f"floor(_e / {cell_days})"))
        base = base.withColumn("_cell", F.explode(cells))
        keys = g + ["_cell"]
    else:
        keys = g
    a = base.select(*[F.col(c) for c in keys],
                    F.col("_id").alias("id_a"),
                    F.col("_s").alias("_sa"), F.col("_e").alias("_ea"))
    b = base.select(*[F.col(c) for c in keys],
                    F.col("_id").alias("id_b"),
                    F.col("_s").alias("_sb"), F.col("_e").alias("_eb"))
    # no group cols and no cells → every pair is a candidate; an empty
    # join-key list crashes Spark's join(), so make the cross explicit
    # (callers at scale should always pass cell_days here)
    paired = a.crossJoin(b) if not keys else a.join(b, keys)
    pairs = (paired
             .filter(F.col("id_a") < F.col("id_b"))
             .filter((F.col("_sa") <= F.col("_eb"))
                     & (F.col("_sb") <= F.col("_ea"))))
    if cell_days:
        # evaluate each pair only in the later-start cell
        pairs = pairs.filter(
            F.expr(f"floor(greatest(_sa, _sb) / {cell_days})") == F.col("_cell"))
    return pairs.select(
        *g,
        "id_a", "id_b",
        (F.least("_ea", "_eb") - F.greatest("_sa", "_sb") + 1)
        .cast("long").alias("overlap_days"))
