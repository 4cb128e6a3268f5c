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


def test_connected_components_chain_olog_rounds(spark):
    """Large-star/small-star must converge in O(log n) rounds on the
    worst-case shape for label propagation: a 1000-node chain (diameter
    999). Plain min-label propagation would need ~1000 rounds; the
    two-phase star algorithm needs ~log2(n)."""
    n = 1000
    chain = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    stats: dict = {}
    cc = dedup.connected_components(chain, max_iter=20, stats=stats)
    rows = {r["node"]: r["comp"] for r in cc.collect()}
    assert len(rows) == n
    assert set(rows.values()) == {0}, "chain is one component rooted at 0"
    assert stats["rounds"] <= 14, f"expected O(log n) rounds, got {stats['rounds']}"


def test_connected_components_rounds_grow_log_not_linear(spark):
    """The standing form of the r12 clusters decade ladder's claim: a
    10x longer chain (10x the diameter) must cost only ~log2(10) ≈ +3
    extra star rounds, never ~10x the rounds. The ladder measured
    14/17/20/24 rounds at 100k/1M/10M/100M half-chain edges; this pins
    the same growth law in-suite at unit scale so a regression in the
    star alternation (e.g. a lost large-star half) fails fast."""
    rounds = {}
    for n in (1_000, 10_000):
        chain = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
        stats: dict = {}
        dedup.connected_components(chain, max_iter=30, stats=stats).count()
        rounds[n] = stats["rounds"]
    grow = rounds[10_000] - rounds[1_000]
    assert 1 <= grow <= 6, f"rounds must grow ~log2(10)≈3 per decade: {rounds}"


def test_connected_components_multi_component_with_singletons(spark):
    """Two separate cliques + isolated nodes: components labeled by min
    member; singletons keep their own id."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)], ["doc_a", "doc_b"]
    )
    nodes = spark.range(15).selectExpr("id AS doc_id")
    cc = dedup.connected_components(edges, nodes=nodes, node_col="doc_id")
    rows = {r["node"]: r["comp"] for r in cc.collect()}
    assert rows[1] == rows[2] == rows[3] == 1
    assert rows[10] == rows[11] == rows[12] == 10
    for singleton in (0, 4, 5, 6, 7, 8, 9, 13, 14):
        assert rows[singleton] == singleton


def test_group_similarity_matrix_exact_and_estimate_contract(spark):
    """Hand-built three-source corpus: A and B share half their shingle
    vocabulary, C is disjoint, D is a clone of A. The exact column must
    equal the serial set-Jaccard of the padded shingle unions; the
    16-perm MinHash estimate must be exact at the j=0 and j=1 endpoints
    (disjoint sets share no hashes; identical sets share all) and within
    sketch tolerance in between."""
    rows = [
        # source A: two docs
        (1, "A", "alpha beta gamma delta epsilon zeta"),
        (2, "A", "eta theta iota kappa"),
        # source B: overlaps A's first doc
        (3, "B", "alpha beta gamma delta epsilon zeta"),
        (4, "B", "lambda mu nu xi"),
        # source C: disjoint vocabulary
        (5, "C", "one two three four five six"),
        # source D: exactly A's shingle union
        (6, "D", "alpha beta gamma delta epsilon zeta"),
        (7, "D", "eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["source_a"], r["source_b"]): (r["est_bp"], r["jaccard_bp"])
        for r in dedup.group_similarity_matrix(df, "source", "text").collect()
    }
    # all C(4,2)=6 unordered pairs present, including the disjoint ones
    assert set(out) == {
        ("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"), ("C", "D")
    }

    def shingle_union(texts: list[str], k: int = 3) -> set:
        u: set = set()
        for t in texts:
            w = t.split()
            grams = {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
            u |= grams if grams else {""}
        return u

    groups = {}
    for _, src, text in rows:
        groups.setdefault(src, []).append(text)
    sets = {s: shingle_union(t) for s, t in groups.items()}
    for (a, b), (est, exact) in out.items():
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert exact == 10000 * len(sets[a] & sets[b]) // len(sets[a] | sets[b]), (a, b)
        # endpoints are estimate-exact; the middle is within 16-perm noise
        if j == 0.0:
            assert est == 0, (a, b, est)
        elif j == 1.0:
            assert est == 10000, (a, b, est)
        else:
            assert abs(est - 10000 * j) <= 4000, (a, b, est, j)


def test_group_similarity_matrix_exact_side_vs_python_reference(spark):
    """Random docs over a tiny vocab, one Spark run, the EXACT-Jaccard
    side of the source-pair matrix compared per pair against a
    pure-Python set-Jaccard reference (the MinHash side has its own
    tolerance contract elsewhere in this file)."""
    import random

    from hadoop_0_20_2_ljx_spark.extensions import dedup

    rng = random.Random(6)
    vocab = [f"w{i}" for i in range(10)]
    rows = [
        (f"s{rng.randint(0, 4)}", " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r["jaccard_bp"]
        for r in dedup.group_similarity_matrix(
            df, "source", "text", num_hashes=8, shingle_k=3
        ).collect()
    }

    def shingles(t):
        w = t.lower().split()
        s = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        return s if s else {""}

    sets: dict[str, set] = {}
    for src, t in rows:
        sets.setdefault(src, set()).update(shingles(t))
    srcs = sorted(sets)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            ni = len(sets[a] & sets[b])
            expect[(a, b)] = 10000 * ni // len(sets[a] | sets[b])
    assert got == expect


def test_group_similarity_matrix_cap_lower_bound_and_bite(spark):
    """max_shingle_freq on the source-pair matrix (r6 verdict task 6):
    shingles in more groups than the cap leave the intersection join,
    so capped jaccard_bp is a per-pair LOWER BOUND of the uncapped one
    while est_bp (MinHash, computed from the uncapped vocabulary) is
    unchanged. The corpus plants boilerplate shared by all four sources
    so the cap provably bites."""
    boiler = "shared legal boilerplate footer text here"
    rows = [
        (1, "A", f"alpha beta gamma delta {boiler}"),
        (2, "B", f"alpha beta gamma epsilon {boiler}"),
        (3, "C", f"one two three four {boiler}"),
        (4, "D", f"five six seven eight {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    full = {
        (r["source_a"], r["source_b"]): (r["est_bp"], r["jaccard_bp"])
        for r in dedup.group_similarity_matrix(df, "source", "text").collect()
    }
    capped = {
        (r["source_a"], r["source_b"]): (r["est_bp"], r["jaccard_bp"])
        for r in dedup.group_similarity_matrix(
            df, "source", "text", max_shingle_freq=3
        ).collect()
    }
    assert set(full) == set(capped) and len(full) == 6  # all pairs survive
    for pair in full:
        assert capped[pair][0] == full[pair][0], pair  # est untouched
        assert capped[pair][1] <= full[pair][1], pair  # lower bound
    # the all-4-group boilerplate shingles were the ONLY overlap of the
    # disjoint pairs, so the cap must drive at least one pair to zero
    assert any(c[1] == 0 < full[p][1] for p, c in capped.items())


def test_group_similarity_matrix_loose_cap_is_noop(spark):
    rows = [
        (1, "A", "alpha beta gamma delta epsilon zeta"),
        (2, "B", "alpha beta gamma delta theta iota"),
        (3, "C", "one two three four five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    base = sorted(map(tuple, dedup.group_similarity_matrix(df, "source", "text").collect()))
    loose = sorted(
        map(
            tuple,
            dedup.group_similarity_matrix(
                df, "source", "text", max_shingle_freq=10**9
            ).collect(),
        )
    )
    assert base == loose
