"""Bloom filters: membership pre-filtering and parquet storage-level blooms.

Reference counterparts:
  - util/bloom/BloomFilter.java (+ DynamicBloomFilter, CountingBloomFilter)
  - BloomMapFile (io/BloomMapFile.java) — MapFile plus a bloom of its keys,
    consulted before the index seek.

Two Spark-native renderings:
  1. ``write_parquet_with_bloom`` — parquet's own column bloom filters
     (row-group pruning on point predicates), the direct BloomMapFile
     analog: the bloom lives WITH the data file.
  2. ``bloom_prefilter`` — the classic semi-join reducer: build a bloom
     over the small side's keys, drop big-side rows that cannot match
     before the join shuffle. The build is distributed (bit positions
     computed JVM-side, only the <= m distinct set positions ever reach
     the driver — bounded by the bitmap size, not the data size); the
     probe is an Arrow-batched pandas UDF over a broadcast bitmap.
     Spark's own runtime bloom join (spark.sql.optimizer.runtime.
     bloomFilter.enabled) does this automatically inside one query;
     this operator is for when the filter must cross a materialization
     boundary (build once, apply to many queries), which Catalyst can't.

Position hashing is md5-derived and computed JVM-side for both build and
probe (one shared expression), so the two agree by construction. No false negatives by
construction; FP rate ~= (1 - e^(-k*n/m))^k.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _positions_expr(key: Column, num_hashes: int, m_bits: int) -> Column:
    """JVM-side bit positions for one key via Kirsch-Mitzenmacher double
    hashing: ONE md5 yields (h1, h2) from disjoint hex ranges, position_i =
    (h1 + i*h2) mod m. One hash computation per row instead of k — the
    probe side scans the big table, so this is the hot expression; the
    i-independence guarantee of double hashing preserves the bloom's FP
    bound. h2 is forced odd so the stride never degenerates to 0 mod 2^j
    divisors of m."""
    digest = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long") * 2 + 1
    return F.array(*[((h1 + F.lit(i) * h2) % m_bits + m_bits) % m_bits for i in range(num_hashes)])


def optimal_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) minimizing memory for a target false-positive rate."""
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / max(1, expected_items) * math.log(2)))
    return m, k


def build_bloom(df: DataFrame, key_col: str, m_bits: int, num_hashes: int) -> np.ndarray:
    """Distributed bloom build, driver-collect-free.

    Positions are computed JVM-side (explode of the shared md5 position
    expression), then each partition ORs its positions into a local packed
    numpy bitmap inside one Arrow batch pass (``mapInArrow`` — no per-row
    Python), and the per-partition bitmaps are OR-merged executor-side via
    ``treeReduce``. The driver receives O(depth) bitmaps of m_bits/8 bytes
    — never a row per set position, and no distinct shuffle at all. At
    1 G keys / 1% fpp (m ~= 9.6e9 bits) driver traffic is ~1.2 GB once,
    versus billions of position rows for a distinct+collect build.
    """
    import pyarrow as pa

    n_bytes = (m_bits + 7) // 8

    def _part_bitmaps(batches):
        bits = np.zeros(m_bits, dtype=bool)
        for b in batches:
            bits[b.column(0).to_numpy(zero_copy_only=False)] = True
        yield pa.RecordBatch.from_arrays(
            [pa.array([np.packbits(bits).tobytes()], type=pa.binary())], ["bm"]
        )

    pos_df = df.select(
        F.explode(_positions_expr(F.col(key_col), num_hashes, m_bits)).alias("p")
    )
    # Right-size build parallelism to the bitmap, not the input split
    # count: a small filter on 32 splits would pay 32 Arrow-worker
    # round-trips to OR 36 KB bitmaps. ~8 Mbit of bitmap per task keeps
    # tasks meaningful at every scale (1 G keys -> ~1200 tasks).
    cur = pos_df.rdd.getNumPartitions()
    parts = max(1, min(cur, m_bits // 8_000_000 + 1))
    if parts < cur:
        pos_df = pos_df.coalesce(parts)
    partials = pos_df.mapInArrow(_part_bitmaps, "bm binary").rdd.map(
        lambda r: np.frombuffer(r[0], dtype=np.uint8).copy()
    )
    try:
        packed = partials.treeReduce(np.bitwise_or)
    except ValueError:  # empty RDD (zero input partitions) — empty filter
        return np.zeros(m_bits, dtype=bool)
    return np.unpackbits(packed)[:m_bits].astype(bool)


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    key: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Keep only big-side rows whose `key` might appear in `small[key]`.

    Superset of the exact semi-join (no false negatives); follow with the
    real join for exactness. Typical use: cut the big side's shuffle volume
    before a selective join, the DistributedCache-bloom pattern.
    """
    # Plain count, not distinct().count(): duplicates only overestimate n,
    # which sizes the bitmap up — safe — and skips a whole distinct shuffle.
    n = expected_items if expected_items is not None else small.count()
    m_bits, k = optimal_params(n, fpp)
    bits = build_bloom(small, key, m_bits, k)
    # Bit positions are computed JVM-side (same expression as the build,
    # so build/probe agree by construction); the Python side only does a
    # vectorized numpy gather over the broadcast bitmap — no per-row
    # hashing in Python (the shared probe in _bits_set_udf).
    bits_set = _bits_set_udf(
        np.packbits(bits).tobytes(), big.sparkSession.sparkContext
    )
    return (
        big.withColumn("_bloom_pos", _positions_expr(F.col(key), k, m_bits))
        .filter(bits_set(F.col("_bloom_pos")))
        .drop("_bloom_pos")
    )


def _bits_set_udf(packed_bytes: bytes, spark_context):
    """Shared probe: broadcast a packed bitmap once, return a pandas UDF
    testing 'all positions set' (unpacks once per task, not per batch)."""
    bc = spark_context.broadcast(packed_bytes)
    _cache: dict[str, np.ndarray] = {}

    @pandas_udf("boolean")
    def bits_set(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        arr = _cache.get("bits")
        if arr is None:
            arr = np.unpackbits(np.frombuffer(bc.value, dtype=np.uint8))
            _cache["bits"] = arr
        mat = np.vstack(pos.to_numpy())
        return pd.Series(arr[mat].all(axis=1))

    return bits_set


class DynamicBloom:
    """Growable bloom: util/bloom/DynamicBloomFilter.java:88 (the INFOCOM'06
    dynamic bloom filter backing BloomMapFile's key bloom,
    io/BloomMapFile.java:38) — an s x m bit matrix where each row is a
    standard bloom recording at most ~``nr`` keys; a key belongs to the
    filter iff some row reports it. Per-row FP stays bounded as the set
    grows because new rows are added instead of saturating one vector.

    Batch rendering of the per-key insert loop: each ``add_frame`` seals
    the active row when it would overflow, and a batch larger than ``nr``
    is hash-bucketed into ceil(n/nr) fresh rows (deterministic xxhash64
    routing — retry-safe where insertion order is not; rows stay ~<= nr
    keys, which is the invariant the FP bound needs). Each row build is
    the collect-free ``build_bloom`` (mapInArrow + treeReduce).
    """

    def __init__(self, nr: int, fpp: float = 0.01) -> None:
        self.nr = int(nr)
        self.fpp = fpp
        self.m_bits, self.k = optimal_params(self.nr, fpp)
        # sealed rows: packed uint8 bitmaps; active row may keep growing
        self._rows: list[np.ndarray] = []
        self._active_count = 0

    @property
    def num_rows(self) -> int:
        return len(self._rows)

    def add_frame(self, df: DataFrame, key_col: str) -> "DynamicBloom":
        n = df.count()
        if n == 0:
            return self
        if self._rows and self._active_count + n <= self.nr:
            # fits in the active row: OR the batch's bitmap into it
            bits = build_bloom(df, key_col, self.m_bits, self.k)
            self._rows[-1] = np.bitwise_or(self._rows[-1], np.packbits(bits))
            self._active_count += n
            return self
        n_buckets = max(1, -(-n // self.nr))  # ceil
        if n_buckets == 1:
            bits = build_bloom(df, key_col, self.m_bits, self.k)
            self._rows.append(np.packbits(bits))
            self._active_count = n
            return self
        bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
        for b in range(n_buckets):
            part = df.filter(bucket == b)
            bits = build_bloom(part, key_col, self.m_bits, self.k)
            self._rows.append(np.packbits(bits))
        self._active_count = self.nr  # hash buckets are ~full; seal them
        return self

    def prefilter(self, big: DataFrame, key: str) -> DataFrame:
        """Keep rows whose key matches ANY matrix row (no false negatives
        across every add_frame ever made)."""
        if not self._rows:
            return big.filter(F.lit(False))
        sc = big.sparkSession.sparkContext
        pos = _positions_expr(F.col(key), self.k, self.m_bits)
        probed = big.withColumn("_dbf_pos", pos)
        cond = F.lit(False)
        for packed in self._rows:
            member = _bits_set_udf(packed.tobytes(), sc)
            cond = cond | member(F.col("_dbf_pos"))
        return probed.filter(cond).drop("_dbf_pos")


class CountingBloom:
    """util/bloom/CountingBloomFilter.java:48: bloom with per-position
    counters so keys can be DELETED. Counters saturate at 15 (the 4-bit
    bucket model, :86-96): a saturated counter never increments nor
    decrements again — deletes under saturation must not create false
    negatives.

    Build is distributed: per-partition ``np.bincount`` of the JVM-computed
    positions (mapInArrow), uint32 partials treeReduce-summed executor-side,
    saturation applied once at the end (add beyond 15 is indistinguishable
    from 15 in the 4-bit model, so post-hoc clipping matches the sticky
    semantics for batch builds). Driver traffic O(m) counters, never rows.
    """

    def __init__(self, expected_items: int, fpp: float = 0.01) -> None:
        self.m_bits, self.k = optimal_params(expected_items, fpp)
        self.counters = np.zeros(self.m_bits, dtype=np.uint8)

    def _position_counts(self, df: DataFrame, key_col: str) -> np.ndarray:
        import pyarrow as pa

        m_bits = self.m_bits

        def _part_counts(batches):
            counts = np.zeros(m_bits, dtype=np.uint32)
            for b in batches:
                p = b.column(0).to_numpy(zero_copy_only=False)
                counts += np.bincount(p, minlength=m_bits).astype(np.uint32)
            yield pa.RecordBatch.from_arrays(
                [pa.array([counts.tobytes()], type=pa.binary())], ["c"]
            )

        pos_df = df.select(
            F.explode(_positions_expr(F.col(key_col), self.k, m_bits)).alias("p")
        )
        partials = pos_df.mapInArrow(_part_counts, "c binary").rdd.map(
            lambda r: np.frombuffer(r[0], dtype=np.uint32).copy()
        )
        try:
            return partials.treeReduce(np.add)
        except ValueError:  # empty RDD
            return np.zeros(m_bits, dtype=np.uint32)

    def add_frame(self, df: DataFrame, key_col: str) -> "CountingBloom":
        total = self.counters.astype(np.uint32) + self._position_counts(df, key_col)
        # sticky saturation: anything that ever reaches 15 pins there
        self.counters = np.minimum(total, 15).astype(np.uint8)
        return self

    def remove_frame(self, df: DataFrame, key_col: str) -> "CountingBloom":
        dec = self._position_counts(df, key_col)
        at_max = self.counters == 15  # unknown true count: never decrement
        dec_applied = np.minimum(dec, self.counters.astype(np.uint32))
        out = self.counters.astype(np.int64) - np.where(at_max, 0, dec_applied)
        self.counters = out.astype(np.uint8)
        return self

    def prefilter(self, big: DataFrame, key: str) -> DataFrame:
        """Keep rows whose every position has counter > 0."""
        packed = np.packbits(self.counters > 0)
        member = _bits_set_udf(
            packed.tobytes(), big.sparkSession.sparkContext
        )
        pos = _positions_expr(F.col(key), self.k, self.m_bits)
        return (
            big.withColumn("_cbf_pos", pos)
            .filter(member(F.col("_cbf_pos")))
            .drop("_cbf_pos")
        )


def write_parquet_with_bloom(
    df: DataFrame, path: str, bloom_cols: list[str], expected_ndv: int = 100_000
) -> None:
    """Parquet with per-column bloom filters — the BloomMapFile analog:
    point predicates on `bloom_cols` skip row groups whose bloom says the
    value is absent, before any page decode."""
    writer = df.write.mode("overwrite")
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    writer.parquet(path)
