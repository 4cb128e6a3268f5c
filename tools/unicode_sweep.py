"""Registry-wide UNICODE-salted replay: insert adversarial unicode
tokens (NBSP, CJK, combining accents, RTL, emoji, zero-width joiner,
ideographic space, vertical tab) into every document and
oracle-compare all 186 registry queries — any divergence is a genuine
Java-regex-vs-RE2 / locale semantics gap in the text contract, exactly
the class the r8 ad-hoc run used to catch the UDTF tokenizer silently
splitting on UNICODE whitespace.

    python tools/unicode_sweep.py          # exit 1 on any unexpected change

EXPECTED_DIVERGENT below is the measured r9 set; every name reduces to
one of the causes documented in queries/base.py and
tests/test_unicode_boundary.py: the \\x0b vertical tab (the one true
Java-\\s vs RE2 \\s divergence), DuckDB's unicode-aware trim() vs
Spark's ASCII trim, and codepoint-for-byte oracle approximations
(ascii()/length() on multi-byte text). A query leaving OR joining the
set is a contract change that must be deliberate.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# the r8 salt set, codepoints explicit: NBSP, CJK, combining accent,
# RTL, emoji, ZWJ, ideographic space, vertical tab, em-dash
SALTS = [
    "café", " ", "猫犬鸟", "étude",
    "שלום", "\U0001f600", "a‍b", "　",
    "\x0b", "naïve—dash",
]

EXPECTED_DIVERGENT: set[str] = {
    # Measured r9 and VERIFIED per-salt: removing the \x0b salt alone
    # shrinks this set to exactly {q_multimodal_features,
    # q_text_bpe_encode}. So: every tokenizing query diverges on \x0b
    # only — the engine contract is Java-\s ([ \t\n\x0b\f\r]) while
    # DuckDB's RE2 \s excludes \x0b, the ONE true \s divergence
    # (queries/base.py); the engine side IS the contract, the oracle is
    # the approximation. q_multimodal_features diverges on every
    # non-ASCII salt (the documented codepoint-for-byte oracle
    # stand-in). q_text_bpe_encode diverges on NBSP/ideographic space
    # only: DuckDB's trim() strips unicode whitespace where Spark's
    # strips ASCII (probed r9: duckdb trim('　x　')='x', Spark
    # trim keeps '\xa0x\xa0').
    "q_agg_domain_mix",
    "q_agg_wordcount",
    "q_corpus_dataset_card",
    "q_corpus_source_sim",
    "q_dedup_clusters",
    "q_dedup_incremental",
    "q_dedup_jaccard",
    "q_dedup_jaccard_est",
    "q_dedup_minhash",
    "q_dedup_paragraph",
    "q_dedup_simhash",
    "q_dedup_simhash_pairs",
    "q_dedup_substring",
    "q_multimodal_features",
    "q_pack_sequences",
    "q_pipeline_training",
    "q_sample_domain_reweight",
    "q_sample_token_budget",
    "q_text_bigram_lm",
    "q_text_bm25",
    "q_text_boilerplate",
    "q_text_bpe_encode",
    "q_text_chunk",
    "q_text_classifier",
    "q_text_decontaminate",
    "q_text_entropy",
    "q_text_fingerprint",
    "q_text_inverted_index",
    "q_text_logprob",
    "q_text_quality",
    "q_text_repetition",
    "q_text_tokens",
    "q_udf_tokenize_udtf",
}


def build_unicode_fixture(dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src = f"{SRC_SF}/{t}.parquet"
        if t != "documents":
            shutil.copyfile(src, f"{dst}/{t}.parquet")
            continue
        tab = pq.read_table(src)
        out = []
        for i, s in enumerate(tab["text"].to_pylist()):
            if s is None:
                out.append(s)
                continue
            words = s.split(" ")
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
            for j in range(3):
                words.insert((h + j * 37) % (len(words) + 1), SALTS[(h + j) % len(SALTS)])
            out.append(" ".join(words))
        cols = {n: (pa.array(out) if n == "text" else tab[n]) for n in tab.column_names}
        pq.write_table(pa.table(cols), f"{dst}/{t}.parquet")


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from boundary import replay_and_diff

    dst = os.path.join(tempfile.gettempdir(), "ljx_sf_unicode")
    return replay_and_diff(
        build_unicode_fixture, dst, EXPECTED_DIVERGENT, "unicode"
    )


if __name__ == "__main__":
    raise SystemExit(main())
