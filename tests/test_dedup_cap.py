"""Hot-shingle frequency cap: the 100 TB guard on exact Jaccard.

Properties:
  - capped pair set is a SUBSET of the uncapped pair set (the cap only
    removes intersection evidence, never invents it);
  - a cap above every shingle's document frequency is a no-op (exact
    equality with the uncapped run).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.extensions import dedup
from tests.conftest import SF_SMOKE


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_capped_pairs_subset_of_uncapped(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    uncapped = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=2, threshold=0.05)
    capped = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=2, threshold=0.05, max_shingle_freq=3
    )
    up, cp = _pairs(uncapped), _pairs(capped)
    assert cp <= up
    # the cap must actually bite at this small threshold/corpus
    assert len(cp) < len(up)


def test_loose_cap_is_noop(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    uncapped = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=3, threshold=0.2)
    capped = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.2, max_shingle_freq=10**9
    )
    assert sorted(map(tuple, uncapped.collect())) == sorted(map(tuple, capped.collect()))
