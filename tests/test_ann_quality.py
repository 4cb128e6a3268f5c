"""ANN quality: the approximate indexes must actually approximate.

Correctness oracles pin determinism; these pin RECALL against the exact
brute-force baseline on the fixture embeddings — the number that tells a
user whether the index is usable, per the bench-not-guess rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.extensions import clustering, similarity
from tests.conftest import SF_T2

K = 5
N_QUERIES = 20


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_and_ivfpq_recall_vs_brute_force(spark):
    emb = catalog.load(spark, SF_T2, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk(similarity.brute_force_knn(emb, queries, k=K))

    ivf = _topk(similarity.ivf_ann(emb, queries, nlist_ids=list(range(8)), k=K))
    books = clustering.pq_train(emb, "vec_id", "embedding", 8, 8, iters=1)
    ivfpq = _topk(
        similarity.ivfpq_ann(emb, queries, list(range(8)), books, k=K)
    )

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
        return hits / (len(exact) * K)

    # larger codebooks (16 centroids, 2 Lloyd rounds) must claw recall back
    books16 = clustering.pq_train(emb, "vec_id", "embedding", 8, 16, iters=2)
    ivfpq16 = _topk(
        similarity.ivfpq_ann(emb, queries, list(range(8)), books16, k=K)
    )

    r_ivf, r_ivfpq, r_ivfpq16 = recall(ivf), recall(ivfpq), recall(ivfpq16)
    # single-probe IVF on 8 coarse lists: recall well above random chance
    # (chance ~ K/list ~ 0.02); PQ adds quantization loss on top — the
    # 8-centroid (3-bit) codebook is deliberately coarse, so its floor is
    # low but far above chance, and the 16-centroid codebook must beat it
    # (the recall-vs-bytes knob actually works).
    assert r_ivf >= 0.5, f"IVF recall@{K} collapsed: {r_ivf:.2f}"
    assert r_ivfpq >= 0.1, f"IVF-PQ recall@{K} collapsed: {r_ivfpq:.2f}"
    assert r_ivfpq16 > r_ivfpq, (
        f"bigger codebook did not help: {r_ivfpq16:.2f} <= {r_ivfpq:.2f}"
    )
    # the composed index cannot beat its own router's ceiling
    assert r_ivfpq16 <= r_ivf + 0.05
