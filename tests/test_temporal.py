"""As-of join and binned range join edge cases."""

from __future__ import annotations

import datetime as dt

from comix_etl_spark.operators.temporal import asof_join, range_join_points_intervals


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00"), "p1"),
         (1, _ts("2024-01-01 09:00"), "p0"),   # before ANY right row → NULL
         (2, _ts("2024-01-01 12:00"), "p2")],
        "k long, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30"), 101, 1.5),
         (1, _ts("2024-01-01 10:00"), 102, 2.5),  # equal ts → INCLUDED (<=)
         (2, _ts("2024-01-01 11:00"), 103, 3.5)],
        "k long, ts timestamp, rid long, v double")
    out = {r.pid: r.v for r in asof_join(
        left, right, key=["k"], value_cols=["v"], tiebreak_col="rid").collect()}
    assert out == {"p0": None, "p1": 2.5, "p2": 3.5}


def test_asof_tie_resolves_to_max_tiebreak(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00"), 5, "lo"), (1, _ts("2024-01-01 09:00"), 9, "hi")],
        "k long, ts timestamp, rid long, v string")
    out = asof_join(left, right, key=["k"], value_cols=["v"], tiebreak_col="rid").collect()
    assert out[0].v == "hi"


def test_asof_rejects_column_collision(spark):
    import pytest
    df = spark.createDataFrame([(1, _ts("2024-01-01"), 1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, key=["k"], value_cols=["v"])


def test_range_join_boundaries_and_multi_bin(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00")),   # == start (inclusive)
         (2, _ts("2024-01-10 00:00")),   # == end (inclusive)
         (3, _ts("2024-01-05 12:00")),   # inside, different bin than start
         (4, _ts("2024-02-01 00:00"))],  # outside
        "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(100, _ts("2024-01-01 00:00"), _ts("2024-01-10 00:00"))],
        "iid long, s timestamp, e timestamp")
    # 2-day bins → interval spans 5 bins; results must still be exact
    out = {r.pid for r in range_join_points_intervals(
        points, ivs, point_col="ts", start_col="s", end_col="e",
        bin_seconds=2 * 24 * 3600).collect()}
    assert out == {1, 2, 3}


def test_range_join_overlapping_intervals_multi_match(spark):
    points = spark.createDataFrame([(1, _ts("2024-01-05 00:00"))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00"), _ts("2024-01-07 00:00")),
         (2, _ts("2024-01-04 00:00"), _ts("2024-01-06 00:00"))],
        "iid long, s timestamp, e timestamp")
    rows = range_join_points_intervals(points, ivs, point_col="ts",
                                       start_col="s", end_col="e",
                                       bin_seconds=24 * 3600).collect()
    assert sorted(r.iid for r in rows) == [1, 2]  # one row per containing interval


def test_gap_fill_forward_fills_and_flags_gaps(spark):
    from comix_etl_spark.operators.temporal import gap_fill_daily

    rows = [
        (1, _ts("2024-01-01T08:00:00"), 10.0),
        (1, _ts("2024-01-01T09:00:00"), 5.0),   # same day → summed
        (1, _ts("2024-01-04T12:00:00"), 7.0),   # 2-day gap before
        (2, _ts("2024-01-02T00:00:00"), 3.0),   # single-day key: no gaps
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = gap_fill_daily(df, key="user_id", ts_col="ts", value_col="value")
    got = {(r.user_id, str(r.day)): (r.filled_value, r.is_gap)
           for r in out.collect()}
    assert got == {
        (1, "2024-01-01"): (15.0, 0),
        (1, "2024-01-02"): (15.0, 1),
        (1, "2024-01-03"): (15.0, 1),
        (1, "2024-01-04"): (7.0, 0),
        (2, "2024-01-02"): (3.0, 0),
    }


def test_interval_overlap_pairs_matches_brute_force(spark):
    """Grid-bucketed pair generation (cells + later-start rule) must
    equal the plain theta-join exactly — including pairs whose
    intervals span many cells and pairs that only touch at one day."""
    import datetime as dt
    import itertools

    from comix_etl_spark.operators.temporal import interval_overlap_pairs

    base = dt.datetime(2024, 1, 1)
    rows = [(1, "g", base, base + dt.timedelta(days=40)),       # long
            (2, "g", base + dt.timedelta(days=5), base + dt.timedelta(days=6)),
            (3, "g", base + dt.timedelta(days=40), base + dt.timedelta(days=41)),  # touches 1
            (4, "g", base + dt.timedelta(days=100), base + dt.timedelta(days=130)),
            (5, "h", base, base + dt.timedelta(days=400)),      # other group
            (6, "h", base + dt.timedelta(days=350), base + dt.timedelta(days=360))]
    df = spark.createDataFrame(rows, "uid long, grp string, s timestamp, e timestamp")
    got = sorted((r.grp, r.id_a, r.id_b, r.overlap_days) for r in
                 interval_overlap_pairs(df, id_col="uid", start_col="s",
                                        end_col="e", group_cols=("grp",),
                                        cell_days=7).collect())
    want = []
    days = {u: (s.date().toordinal(), e.date().toordinal())
            for u, g, s, e in rows}
    grp = {u: g for u, g, _, _ in rows}
    for a, b in itertools.combinations(sorted(days), 2):
        if grp[a] != grp[b]:
            continue
        (sa, ea), (sb, eb) = days[a], days[b]
        if sa <= eb and sb <= ea:
            want.append((grp[a], a, b, min(ea, eb) - max(sa, sb) + 1))
    assert got == sorted(want)
    assert ("g", 1, 3, 1) in got  # touch-only pair survives


def test_interval_overlap_empty_and_singleton(spark):
    import datetime as dt

    from comix_etl_spark.operators.temporal import interval_overlap_pairs

    empty = spark.createDataFrame([], "uid long, s timestamp, e timestamp")
    assert interval_overlap_pairs(empty, id_col="uid", start_col="s",
                                  end_col="e", cell_days=7).count() == 0
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 5))],
        "uid long, s timestamp, e timestamp")
    assert interval_overlap_pairs(one, id_col="uid", start_col="s",
                                  end_col="e", cell_days=7).count() == 0


def test_interval_overlap_pre_epoch_days_do_not_collapse(spark):
    """ADVICE r6: day bucketing must use floor division — with `div`
    truncation, 1969-12-31 lands on day 0 and falsely overlaps
    1970-01-01. The two one-day intervals below are adjacent, not
    overlapping."""
    import datetime as dt

    from comix_etl_spark.operators.temporal import interval_overlap_pairs

    rows = [("a", dt.datetime(1969, 12, 31, 6), dt.datetime(1969, 12, 31, 18)),
            ("b", dt.datetime(1970, 1, 1, 6), dt.datetime(1970, 1, 1, 18)),
            ("c", dt.datetime(1969, 12, 31, 12), dt.datetime(1970, 1, 1, 12))]
    df = spark.createDataFrame(rows, "uid string, s timestamp, e timestamp")
    got = {(r.id_a, r.id_b, r.overlap_days)
           for r in interval_overlap_pairs(
               df, id_col="uid", start_col="s", end_col="e",
               cell_days=2).collect()}
    # c spans both days; a-b must NOT pair
    assert got == {("a", "c", 1), ("b", "c", 1)}, got


def test_null_bounded_intervals_drop_instead_of_raising(spark):
    """ADVICE r7: assert_true raises on a NULL condition, so a single
    NULL-bounded interval used to kill the whole job with a misleading
    'reversed interval' message. NULL bounds must instead drop the row
    (the pre-guard sequence(s, NULL) behavior) while a genuinely
    reversed interval still fails loud."""
    import pytest
    from comix_etl_spark.operators.temporal import interval_overlap_pairs

    rows = [("a", _ts("2024-01-01 00:00"), _ts("2024-01-03 00:00")),
            ("b", _ts("2024-01-02 00:00"), _ts("2024-01-04 00:00")),
            ("n", None, _ts("2024-01-02 00:00")),
            ("m", _ts("2024-01-02 00:00"), None)]
    df = spark.createDataFrame(rows, "uid string, s timestamp, e timestamp")
    got = {(r.id_a, r.id_b) for r in interval_overlap_pairs(
        df, id_col="uid", start_col="s", end_col="e", cell_days=2).collect()}
    assert got == {("a", "b")}, got  # NULL-bounded rows silently dropped

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00"))], "pid long, ts timestamp")
    ivs = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00"), _ts("2024-01-02 00:00")),
         (11, None, _ts("2024-01-02 00:00"))],
        "iid long, s timestamp, e timestamp")
    out = range_join_points_intervals(
        pts, ivs, point_col="ts", start_col="s", end_col="e",
        bin_seconds=3600).collect()
    assert [r.iid for r in out] == [10]

    # reversed (non-NULL) interval still raises
    bad = spark.createDataFrame(
        [(12, _ts("2024-01-03 00:00"), _ts("2024-01-01 00:00"))],
        "iid long, s timestamp, e timestamp")
    with pytest.raises(Exception, match="reversed interval"):
        range_join_points_intervals(
            pts, bad, point_col="ts", start_col="s", end_col="e",
            bin_seconds=3600).collect()
