"""Temporal joins: as-of (point-in-time) and binned range (interval) joins.

The reference engine has no native temporal joins — users emulate them
with a reduce-side secondary sort (tag both inputs, sort by (key, time,
tag), sweep the reducer stream carrying the last-seen right record; see
reference src/mapred/org/apache/hadoop/mapred/join/CompositeRecordReader.java:60
and the secondary-sort pattern in mapred/lib/KeyFieldBasedPartitioner.java:30).
This module expresses the same sweep relationally so Catalyst plans it:

- ``asof_join``: union both sides, one window sweep per key ordered by
  time. Exactly one shuffle (on the key), no per-key driver loop — the
  100 TB shape. Skewed keys are AQE's problem, same as any keyed window.
- ``range_join_binned``: point-in-interval join WITHOUT an equi key.
  The naive form is a cross product with a range predicate
  (BroadcastNestedLoopJoin — quadratic, dies at scale). Binning rewrites
  it into an equi-join: each interval explodes to the fixed-width bins
  it covers, each point maps to its single bin, join on bin, then apply
  the exact containment filter. Plan is SMJ/BHJ on the bin key; cost is
  O(points + intervals * bins_per_interval), never |points|*|intervals|.
- ``overlap_join_binned``: interval-interval overlap with the same bin
  rewrite; pair dedup is free (each pair kept only in the bin owning the
  later start) so no distinct shuffle follows the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): each left row
    picks the LATEST right row with ``right_ts <= left_ts`` for the same
    key(s) (inclusive at equality, matching DuckDB/pandas ``merge_asof``
    backward semantics). ``direction="forward"``: the EARLIEST right row
    with ``right_ts >= left_ts`` — the "next scheduled event" shape
    (next maintenance window, next price revision), which is the same
    one-shuffle sweep run in reverse time order. Left rows with no
    matching right row keep NULL value columns (left-join shape).

    Right rows must be unique per (key, right_ts) for a deterministic
    result — pre-aggregate duplicates first (ties would otherwise make
    "the latest row" ambiguous in every engine).

    NULL timestamps follow SQL inequality semantics (r9): a null
    ``right_ts`` row never matches anything (dropped before the sweep)
    and a null ``left_ts`` row matches nothing (kept, NULL value
    columns) — identical to a native ASOF join's behavior, pinned by an
    explicit nulls-first sweep order in both directions.

    Implementation: union the tagged inputs and run one window sweep —
    ``last(value, ignorenulls=True)`` over (key) ordered by
    (ts, right-first). One shuffle total; no range predicate, no
    cross product. This is the relational rendering of the reference's
    reduce-side secondary-sort sweep (KeyFieldBasedPartitioner partitions
    on the key prefix, the comparator orders by time within the key).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    value_cols = list(value_cols)
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    # NULL-timestamp contract (r9, the base.py NULL-ordering boundary):
    # SQL inequality semantics say a NULL right_ts can never satisfy
    # right_ts <= left_ts (or >=), so null-ts right rows are dropped
    # BEFORE the sweep — unfiltered, the window's last() would carry one
    # as a live match (its struct is non-null), silently matching rows a
    # native ASOF join leaves unmatched. NULL left_ts rows stay (left-
    # join shape) and get NULL value columns via the explicit nulls-FIRST
    # sweep order below.
    r = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_src"),
        *[F.col(c) for c in value_cols],
    )
    l_cols = [c for c in left.columns if c not in on and c != left_ts]
    lt = left.select(
        *on,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_src"),
        *[F.col(c) for c in l_cols],
    )
    u = lt.unionByName(r, allowMissingColumns=True)

    # right rows (_asof_src=0) sort before left rows at equal ts -> inclusive
    # in BOTH directions; forward just sweeps time in reverse order.
    # Null ordering is PINNED nulls-first in both directions (desc's
    # default is nulls-LAST) so a null-ts left row sorts before every
    # right row and sees a NULL marker — "no match", exactly what the
    # inequality semantics give a native ASOF join.
    ts_order = (
        F.col("_asof_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_asof_ts").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_asof_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the carried state is the whole matched right ROW (a struct), not the
    # bare value columns: last(value, ignorenulls) would skip a right row
    # whose value is genuinely NULL and resurrect a stale older match —
    # the struct is non-NULL for every right row, so NULL values propagate
    # faithfully and _asof_matched_ts always belongs to the value returned
    marker = F.last(
        F.when(
            F.col("_asof_src") == 0,
            F.struct(
                F.col("_asof_ts").alias("_mts"),
                *[F.col(c).alias(c) for c in value_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        u.select(
            *on,
            F.col("_asof_ts").alias(left_ts),
            F.col("_asof_src"),
            *l_cols,
            *[marker[c].alias(c) for c in value_cols],
            marker["_mts"].alias("_asof_matched_ts"),
        )
        .where(F.col("_asof_src") == 1)
        .drop("_asof_src")
    )


def _bin_of(c: Column, bin_width: int) -> Column:
    """Floor-divided bin id, exact for the full long range. The final
    division goes through decimal(38,0), not `/` (double): the numerator
    is already an exact multiple of bin_width, and double division would
    mis-round values above 2^53 (epoch nanos are ~1.7e18) into the
    neighboring bin. Negative values floor correctly via the pmod."""
    m = ((c % bin_width) + bin_width) % bin_width
    return ((c - m).cast("decimal(38,0)") / F.lit(bin_width)).cast("long")


def _guarded_bin_explode(
    start_col: str, end_col: str, bin_width: int, max_bins: int
) -> Column:
    """Explode expression for every bin a half-open interval covers (the
    last covered bin belongs to ``end - 1``).

    Edge handling, in precedence order:
    - NULL or empty/inverted bounds (end <= start) match nothing — they
      explode to zero bins, the same rows a SQL range predicate drops
      (Spark ``sequence(a, b)`` with a > b would otherwise auto-generate
      a DESCENDING array, silently bypassing the size guard).
    - An interval spanning >= max_bins bins would sequence-explode into
      millions of rows — fail loudly instead of OOMing an executor;
      pick a larger bin_width."""
    empty = F.array().cast("array<bigint>")
    first_bin = _bin_of(F.col(start_col), bin_width)
    last_bin = _bin_of(F.col(end_col) - F.lit(1), bin_width)
    return F.explode(
        F.when(
            F.col(start_col).isNull()
            | F.col(end_col).isNull()
            | (F.col(end_col) <= F.col(start_col)),
            empty,
        )
        .when(last_bin - first_bin < F.lit(max_bins), F.sequence(first_bin, last_bin))
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"binned temporal join: interval spans >={max_bins} bins "
                    f"at bin_width={bin_width} (start=%s, end=%s) — "
                    "increase bin_width or max_bins_per_interval",
                    F.col(start_col).cast("string"),
                    F.col(end_col).cast("string"),
                )
            ).cast("array<bigint>")
        )
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    extra_on: Sequence[str] = (),
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Join points to half-open intervals ``[start, end)`` via fixed-width
    binning so the plan is an equi-join, never a nested-loop cross
    product. Point/start/end are integer-like columns in the same unit
    (e.g. epoch micros); ``bin_width`` is the bin size in that unit and
    should be ≥ the typical interval length so each interval covers
    only 1-2 bins.

    Each interval is exploded to every bin it overlaps (``sequence`` of
    floor-divided bin ids — no correlated subquery, pure JVM
    expressions); each point belongs to exactly one bin, so the
    bin-equi-join introduces no duplicate matches and needs no distinct.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    extra_on = list(extra_on)

    p = points.withColumn("_rj_bin", _bin_of(F.col(point_col), bin_width))
    iv = intervals.withColumn(
        "_rj_bin",
        _guarded_bin_explode(start_col, end_col, bin_width, max_bins_per_interval),
    )
    cond = [p["_rj_bin"] == iv["_rj_bin"]]
    cond += [p[c] == iv[c] for c in extra_on]
    cond += [p[point_col] >= iv[start_col], p[point_col] < iv[end_col]]
    joined = p.join(iv, cond, "inner")
    keep = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in extra_on
    ]
    return joined.select(*keep)


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Interval-interval overlap join (half-open: a overlaps b iff
    ``a.start < b.end AND b.start < a.end``) as a bin equi-join.

    Duplicate elimination without a distinct: both sides explode to
    their covered bins, but a candidate pair is kept only in the single
    bin containing ``max(left.start, right.start)`` (the later start lies
    inside both intervals whenever they overlap, and lies in exactly one
    bin) — so each overlapping pair surfaces exactly once and the plan
    needs no post-join dedup shuffle. Same cost model as
    ``range_join_binned``; pick ``bin_width`` ≥ typical interval length.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    lt = left.withColumn(
        "_ov_bin",
        _guarded_bin_explode(left_start, left_end, bin_width, max_bins_per_interval),
    )
    rt = right.withColumn(
        "_ov_bin",
        _guarded_bin_explode(right_start, right_end, bin_width, max_bins_per_interval),
    )
    later_start = F.greatest(lt[left_start], rt[right_start])
    cond = [
        lt["_ov_bin"] == rt["_ov_bin"],
        lt[left_start] < rt[right_end],
        rt[right_start] < lt[left_end],
        # keep the pair only in the bin that owns the later start
        lt["_ov_bin"] == _bin_of(later_start, bin_width),
    ]
    joined = lt.join(rt, cond, "inner")
    return joined.select(
        *[lt[c] for c in left.columns], *[rt[c] for c in right.columns]
    )


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Union overlapping/touching intervals per key into maximal
    disjoint spans — the coverage primitive (total active time, gap
    detection, billing-span consolidation). The reference's users run
    it as a secondary-sort reduce sweeping each key's sorted intervals
    with running state (the same tagged-sweep pattern as the manual
    as-of join above); here it is one keyed window pass.

    Algorithm: order intervals by (start, end, id); an interval opens a
    NEW span iff its start is strictly after the running max of all
    previous ends (prefix-max over an unbounded-preceding frame —
    touching intervals, start == prev end, merge); the running sum of
    open-flags numbers the spans, and one groupBy collapses each span.

    Determinism: integer timestamps, total tie-broken ordering, and the
    prefix-max depends only on the sorted multiset — bit-identical
    cross-engine and under any partitioning. Shape: ONE hash
    partitioning by key shared by the window pair and the final
    partial aggregate; no join, no second scan.

    Intervals with a NULL endpoint are EXCLUDED (r9): an interval needs
    both endpoints to cover anything, and ranking null starts instead
    rides the engines' opposite null-ordering defaults (base.py
    NULL-ordering boundary).
    """
    from pyspark.sql.window import Window

    df = df.where(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(start_col, end_col, id_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    seg = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_seg", seg)
        .groupBy(*keys, "_seg")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .drop("_seg")  # internal span counter, not part of the contract
    )
