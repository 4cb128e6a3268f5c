"""Iterative clustering over embedding columns: Lloyd's k-means expressed
DataFrame-first. Engine extra for training-data curation (cluster-balanced
sampling, IVF centroid training — extensions/similarity.ivf_assign consumes
exactly this op's output shape).

Scale shape per iteration:
- assignment: ONE projection per scan — centroids are driver-held
  literals (O(k*dim), tiny by definition), folded into a `least(struct)`
  argmin expression; no join, no shuffle, whole-stage codegen.
- update: per-dimension `avg` aggregates — partial (map-side combined)
  sums, one k x dim-sized shuffle per partition, driver receives k rows.
This is the classic MapReduce k-means economics: iterations scan the
corpus, driver traffic is centroids only. For very large k*dim (where a
k x dim expression tree stops being reasonable) switch the assignment to
a pandas-UDF numpy matmul; at k<=few hundred the expression form keeps
everything JVM-side.

Determinism: fixed init + fixed iteration count + strict < argmin with
lowest-cluster tie-break -> bit-stable partition-count-independent
assignments (the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq_dist(vec: Column, cent: list[float]) -> Column:
    """Squared L2 distance between an array<double> column and a literal
    centroid, as a left-to-right fold (index order — matches list_sum of a
    list_transform in DuckDB)."""
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: dict[int, list[float]], out_col: str = "cluster"
) -> DataFrame:
    """Nearest-centroid assignment as one projection: `least` over
    (distance, cluster_id) structs = argmin with lowest-id tie-break."""
    vec = F.col(vec_col).cast("array<double>")
    pairs = [
        F.struct(sq_dist(vec, c).alias("d"), F.lit(int(j)).alias("c"))
        for j, c in sorted(centroids.items())
    ]
    return df.withColumn(out_col, F.least(*pairs).getField("c"))


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    init: dict[int, list[float]],
) -> tuple[DataFrame, dict[int, list[float]]]:
    """``iters`` Lloyd rounds from the given initial centroids. Round t
    assigns by the round-(t-1) centroids then recomputes means. Returns
    (the last round's assignment DataFrame, the post-update centroids).
    Clusters that lose all members drop out (GROUP BY semantics)."""
    dim = len(next(iter(init.values())))
    vec = F.col(vec_col).cast("array<double>")
    cents = {int(j): [float(x) for x in c] for j, c in init.items()}
    assigned = assign_clusters(df, vec_col, cents)
    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, cents)
        rows = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(F.element_at(vec, i + 1)).alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        cents = {int(r["cluster"]): [float(r[f"d{i}"]) for i in range(dim)] for r in rows}
    return assigned, cents
