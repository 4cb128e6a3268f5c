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


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    k: int,
    iters: int,
    init_ids: int | None = None,
) -> list[dict[int, list[float]]]:
    """Product-quantization codebook training: split the vector into ``m``
    contiguous subspaces and run ``iters`` Lloyd rounds in each, seeded by
    the sub-vectors of the first ``k`` ids (deterministic). Driver holds
    only the m x k x (dim/m) codebooks — the corpus is scanned, never
    collected."""
    vec = F.col(vec_col).cast("array<double>")
    init_rows = df.filter(F.col(id_col) < k).select(id_col, vec.alias("_v")).collect()
    dim = len(init_rows[0]["_v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[dict[int, list[float]]] = [
        {
            int(r[id_col]): [float(x) for x in r["_v"][j * sub : (j + 1) * sub]]
            for r in init_rows
        }
        for j in range(m)
    ]
    # One Spark job per Lloyd round for ALL m subspaces: per-row structs
    # (j, code_j, subvector) exploded, then a single groupBy(j, code) with
    # per-dim partial avgs — the same one-shuffle relational shape as the
    # simhash bit votes. Driver receives m*k centroid rows per round.
    for _ in range(iters):
        structs = []
        for j, book in enumerate(books):
            subv = F.slice(vec, j * sub + 1, sub)
            pairs = [
                F.struct(sq_dist(subv, c).alias("d"), F.lit(int(ci)).alias("c"))
                for ci, c in sorted(book.items())
            ]
            structs.append(
                F.struct(
                    F.lit(j).alias("j"),
                    F.least(*pairs).getField("c").alias("code"),
                    subv.alias("sv"),
                )
            )
        exploded = df.select(F.explode(F.array(*structs)).alias("s")).select(
            "s.j", "s.code", "s.sv"
        )
        rows = (
            exploded.groupBy("j", "code")
            .agg(*[F.avg(F.col("sv")[i]).alias(f"d{i}") for i in range(sub)])
            .collect()
        )
        books = [{} for _ in range(m)]
        for r in rows:
            books[int(r["j"])][int(r["code"])] = [float(r[f"d{i}"]) for i in range(sub)]
    return books


def pq_code_exprs(
    vec: Column, books: list[dict[int, list[float]]]
) -> tuple[list[Column], int]:
    """The m argmin code columns for an array<double> vector column —
    literal-centroid expressions only (codegen, no join, no shuffle).
    Returns (code columns named code_0..code_{m-1}, subspace width)."""
    dim = sum(len(next(iter(b.values()))) for b in books)
    sub = dim // len(books)
    cols = []
    for j, book in enumerate(books):
        subv = F.slice(vec, j * sub + 1, sub)
        pairs = [
            F.struct(sq_dist(subv, c).alias("d"), F.lit(int(ci)).alias("c"))
            for ci, c in sorted(book.items())
        ]
        cols.append(F.least(*pairs).getField("c").alias(f"code_{j}"))
    return cols, sub


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, books: list[dict[int, list[float]]]
) -> DataFrame:
    """Encode every vector as m codebook indices (the int8-per-subspace PQ
    code) in ONE projection — all m argmin assignments are literal-centroid
    expressions, so the scan has no join and no shuffle. At 64 dims /
    m=8 this stores 8 bytes per vector instead of 256/512."""
    vec = F.col(vec_col).cast("array<double>")
    cols, _sub = pq_code_exprs(vec, books)
    return df.select(F.col(id_col), *cols)
