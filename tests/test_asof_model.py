"""Differential test: extensions.temporal.asof_join against
pandas.merge_asof (an independent single-node implementation of the same
backward-inclusive semantics). Seeded random frames, several shapes:
dense ties at equal timestamps across sides, keys present on only one
side, empty right partitions.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from hadoop_0_20_2_ljx_spark.extensions import temporal


def _random_case(seed: int):
    rng = random.Random(seed)
    n_keys = rng.randint(1, 6)
    keys = [f"k{i}" for i in range(n_keys)]
    left = [
        (rng.choice(keys), rng.randint(0, 50), i)
        for i in range(rng.randint(1, 60))
    ]
    # right times unique per key: ties there would make "the latest row"
    # ambiguous in any engine (documented precondition of asof_join)
    right = []
    for k in keys[: rng.randint(1, n_keys)]:
        for t in rng.sample(range(0, 50), rng.randint(0, 12)):
            right.append((k, t, float(rng.randint(1, 999))))
    return left, right


@pytest.mark.parametrize("seed", range(8))
def test_asof_matches_pandas_merge_asof(spark, seed):
    left, right = _random_case(seed)
    ldf = spark.createDataFrame(left, "k string, t long, rid long")
    rdf = spark.createDataFrame(
        right or [("__none__", -1, 0.0)], "k string, t long, v double"
    )
    got = {
        r["rid"]: r["v"]
        for r in temporal.asof_join(ldf, rdf, ["k"], "t", "t", ["v"]).collect()
    }

    lp = pd.DataFrame(left, columns=["k", "t", "rid"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        right or [("__none__", -1, 0.0)], columns=["k", "t", "v"]
    ).sort_values("t", kind="stable")
    exp_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp = {
        int(r.rid): (None if pd.isna(r.v) else float(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp
