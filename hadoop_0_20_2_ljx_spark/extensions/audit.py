"""Data-quality auditing for 100 TB pipelines: constraint checks,
distribution-drift scoring, exact statistical outlier detection.

No single reference counterpart — the reference's users bolt these
checks on as counter-only MapReduce jobs (Reporter counters,
mapred/Counters.java:47, incremented per bad record and read off the
JobTracker UI); here each audit is a declarative one-pass aggregate
whose RESULT is a DataFrame the pipeline can gate on.

Determinism contract (queries/base.py rules): every metric is derived
from exact integer aggregates — row counts, integer-cent sums, integer
sums of squares, integer histogram counts — and only converted to a
float (or divided) at the very end, where both engines start from
identical integers and therefore produce identical doubles. No raw
float sum ever crosses an aggregation boundary, so results are
partition-order- and retry-invariant: the property that matters when
1000 executors sum in arbitrary order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _ppm(num: F.Column, den: F.Column) -> F.Column:
    """Exact parts-per-million: counts are nonnegative, so
    floor(10^6 * num / den) == integer division — same floor() on the
    DuckDB side (int64 products stay exact in a double up to 2^53;
    count*10^6 is below that for any driver-scale table, and production
    renders it as a BIGINT `div`)."""
    return F.floor(F.lit(PPM) * num / den).cast("long")


def completeness_check(df: DataFrame, col: str, min_ppm: int = PPM) -> DataFrame:
    """Deequ-style completeness: fraction of non-null values, in ppm."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"), F.count(F.col(col)).alias("_nn")
    )
    metric = _ppm(F.col("_nn"), F.col("_n"))
    return agg.select(
        F.lit(f"complete:{col}").alias("check_name"),
        metric.alias("metric_ppm"),
        (metric >= min_ppm).alias("passed"),
    )


def uniqueness_check(df: DataFrame, col: str, min_ppm: int = PPM) -> DataFrame:
    """Key-uniqueness: distinct/total in ppm. countDistinct is the exact
    two-phase distinct aggregate (partials per partition, no collect)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"), F.countDistinct(F.col(col)).alias("_d")
    )
    metric = _ppm(F.col("_d"), F.col("_n"))
    return agg.select(
        F.lit(f"unique:{col}").alias("check_name"),
        metric.alias("metric_ppm"),
        (metric >= min_ppm).alias("passed"),
    )


def referential_check(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential integrity: ppm of child rows whose key exists in the
    parent. Shaped as count(total) minus count(anti-join survivors) —
    the anti-join is a plain equi-join (broadcast when the parent key
    set is small, SMJ otherwise); never a per-row lookup."""
    keys = parent.select(F.col(parent_col).alias(child_col), F.lit(1).alias("_hit"))
    agg = child.join(keys.distinct(), child_col, "left").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).cast("long").alias("_o"),
    )
    metric = _ppm(F.col("_n") - F.col("_o"), F.col("_n"))
    return agg.select(
        F.lit(f"ref:{child_col}").alias("check_name"),
        metric.alias("metric_ppm"),
        (metric >= PPM).alias("passed"),
    )


def predicate_check(df: DataFrame, name: str, cond: F.Column, min_ppm: int) -> DataFrame:
    """Generic row-predicate compliance (range / accepted-values / regex):
    ppm of rows satisfying `cond`, one partial-agg scan."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("_ok"),
    )
    metric = _ppm(F.col("_ok"), F.col("_n"))
    return agg.select(
        F.lit(name).alias("check_name"),
        metric.alias("metric_ppm"),
        (metric >= min_ppm).alias("passed"),
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    cents_col: F.Column,
    id_cols: list[str],
    z_threshold: float = 2,
) -> DataFrame:
    """Per-group statistical outliers with an EXACT decision boundary.

    |x - mean| > z*sigma is evaluated entirely in integers:
        10^4 * (n*x - S)^2 > round(10^4 * z^2) * (n*Q - S^2)
    where S = sum(cents), Q = sum(cents^2) — both BIGINT sums, so the
    outlier SET is bit-exact across engines/partitionings (a float
    mean/stddev would make boundary rows flip with summation order).
    The reported z value itself (basis points) divides/sqrt's those same
    integers, so it is identical doubles on both sides.

    Shape: one partial-agg groupBy for (n, S, Q) — tiny result, re-enters
    broadcast — plus one filtered scan. The products (n*Q, S^2, dev^2,
    z^2*var) are computed in DECIMAL(38,0): in pure int64 the binding
    constraint is n*max_cents < ~3.0e9 — only ~60k rows per group at
    $500 values, nowhere near corpus scale. DECIMAL(38,0) holds dev^2
    and z^2*n^2*var up to 10^38; with the extra 10^4 fixed-point factor
    on each side the bound is n*max_cents < ~10^17/z — ~1e12 rows per
    group at $500, comfortably past the 100 TB posture. The
    raw cent values and the emitted columns stay BIGINT.
    """
    x = cents_col.cast("long").alias("_c")
    base = df.select(*id_cols, F.col(group_col).alias("_g"), x)

    def _d(col: F.Column) -> F.Column:
        return col.cast("decimal(38,0)")

    stats = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_c").cast("long").alias("_s"),
        # sum of squares in decimal: c^2 alone is ~2.5e9 at $500, so an
        # int64 sum dies at ~3.7e9 rows; the decimal sum does not.
        F.sum(_d(F.col("_c")) * _d(F.col("_c"))).alias("_q"),
    )
    j = base.join(F.broadcast(stats), "_g")
    dev = _d(F.col("_n")) * _d(F.col("_c")) - _d(F.col("_s"))  # n*x - S
    var_n2 = _d(F.col("_n")) * F.col("_q") - _d(F.col("_s")) * _d(F.col("_s"))  # n^2 * var
    # z^2 in fixed point at 10^-4 (the same granularity as the reported
    # z_bp): a fractional z^2 (z=2.5 -> 6.25) must not silently round to
    # an integer and loosen the boundary. Both sides scale by 10^4, so
    # integer z^2 call sites (z=2 -> 40000/10^4) are bit-unchanged.
    z2_fp = round(float(z_threshold) * float(z_threshold) * 10_000)
    is_out = (dev * dev * F.lit(10_000).cast("decimal(38,0)")) > (
        F.lit(z2_fp).cast("decimal(38,0)") * var_n2
    )
    z_bp = F.floor(
        F.lit(10000.0) * dev.cast("double") / F.sqrt(var_n2.cast("double"))
    ).cast("long")
    return (
        j.where(is_out & (var_n2 > 0))
        .select(
            *id_cols,
            F.col("_g").alias(group_col),
            F.col("_c").alias("cents"),
            z_bp.alias("z_bp"),
        )
    )


def distribution_drift_js(
    df: DataFrame,
    group_col: str,
    bin_col: F.Column,
    split_cond: F.Column,
    n_bins: int,
) -> DataFrame:
    """Jensen-Shannon divergence between two slices of each group's
    binned distribution (train/holdout, this-week/last-week — the drift
    monitor every production corpus pipeline runs).

    Histogram counts are exact integer aggregates; each bin's JS term is
    computed from those identical integers and floored to NANO units
    (BIGINT), and the per-group total is an integer sum — order-
    independent, bit-exact cross-engine. A float-summed JS would not be.

    Shape: one groupBy(group, bin) with map-side partials (state bounded
    by groups*bins), then a groups*bins-sized re-aggregation. The data
    is scanned once; nothing is collected.

    n_bins is ENFORCED here: bin ids are clamped to <= n_bins-1
    (least()), so a caller-supplied binning that overflows the declared
    bin count cannot blow the groups*bins state bound — overflow mass
    lands in the last bin. Callers wanting an unclamped domain pass the
    true max bin count.
    """
    clamped = F.least(bin_col.cast("long"), F.lit(n_bins - 1).cast("long"))
    counts = drift_counts(df, group_col, clamped, split_cond)
    return js_from_counts(counts, group_col)


def drift_counts(
    df: DataFrame, group_col: str, bin_col: F.Column, split_cond: F.Column
) -> DataFrame:
    """The drift monitor's sufficient statistics: exact integer histogram
    counts per (group, bin, slice). These are ADDITIVE — counts from
    micro-batches / daily partitions merge by plain summation — which is
    what makes the monitor streamable via foreachBatch: keep a running
    counts table (groups*bins rows, corpus-size-independent), add each
    batch's counts, and re-finalize with js_from_counts. Never re-scan
    history."""
    binned = df.select(
        F.col(group_col).alias("_g"),
        bin_col.cast("long").alias("_b"),
        F.when(split_cond, 1).otherwise(0).alias("_h"),
    )
    return binned.groupBy("_g", "_b").agg(
        F.sum(F.when(F.col("_h") == 1, 1).otherwise(0)).cast("long").alias("_c1"),
        F.sum(F.when(F.col("_h") == 0, 1).otherwise(0)).cast("long").alias("_c2"),
    )


def merge_drift_counts(counts: DataFrame) -> DataFrame:
    """Collapse accumulated per-batch count rows back to one row per
    (group, bin) — the merge step of the streamable monitor."""
    return counts.groupBy("_g", "_b").agg(
        F.sum("_c1").cast("long").alias("_c1"), F.sum("_c2").cast("long").alias("_c2")
    )


def js_from_counts(counts: DataFrame, group_col: str) -> DataFrame:
    """Finalize JS divergence from (merged) drift_counts output.

    Slice totals come from a whole-partition WINDOW over the counts
    table, not a groupBy+join-back: the join-back shape consumes
    `counts` twice with different column pruning, so neither static nor
    AQE exchange reuse fires and the RAW corpus is scanned/aggregated
    twice — at 100 TB that doubles the dominant cost. The window adds
    one exchange of the groups×bins-sized counts (negligible) and the
    corpus is scanned once; plan-asserted in tests/test_scale_properties.
    """
    from pyspark.sql.window import Window

    wg = Window.partitionBy("_g")
    j = counts.withColumn("_t1", F.sum("_c1").over(wg).cast("long")).withColumn(
        "_t2", F.sum("_c2").over(wg).cast("long")
    )
    # empty-slice guard: a group wholly inside one slice has t=0; treat
    # the missing slice as the zero distribution (JS degenerates to
    # ln2/2) instead of letting 0/0 NaN poison m and crash the ANSI
    # double->long cast at runtime. Fixture groups always span both
    # slices, so the oracle needs no twin guard.
    p = F.when(F.col("_t1") > 0, F.col("_c1") / F.col("_t1")).otherwise(F.lit(0.0))
    q = F.when(F.col("_t2") > 0, F.col("_c2") / F.col("_t2")).otherwise(F.lit(0.0))
    m = (p + q) / 2
    term = (
        F.when(F.col("_c1") > 0, p * F.log(p / m) / 2).otherwise(F.lit(0.0))
        + F.when(F.col("_c2") > 0, q * F.log(q / m) / 2).otherwise(F.lit(0.0))
    )
    term_nano = F.floor(F.lit(1e9) * term).cast("long")
    return (
        j.select("_g", term_nano.alias("_tn"))
        .groupBy("_g")
        .agg(F.sum("_tn").cast("long").alias("js_nano"))
        .withColumnRenamed("_g", group_col)
    )
