"""Unit tests for the training-data function library (text analysis,
dedup family, similarity, multimodal plumbing) on tiny frames.  The
full-table DuckDB cross-checks run via tools/selfcheck.py and the
driver's correctness gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chomper_spark.functions import docdedup as dd
from chomper_spark.functions import multimodal as mm
from chomper_spark.functions import similarity as sim
from chomper_spark.functions import text as txt


def _docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    return spark.createDataFrame(
        [
            (0, base, "en", "s0", len(base)),
            (1, base, "en", "s0", len(base)),  # exact dup of 0
            (2, base + " iota", "en", "s1", len(base) + 5),  # near dup of 0
            (3, "the cat sat on the mat and the dog slept", "en", "s1", 41),
            (4, "der hund und die katze und das haus", "de", "s2", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_token_stats(spark):
    r = {x["doc_id"]: x for x in txt.token_stats(_docs(spark)).collect()}
    assert r[0]["n_tokens_ws"] == 8 and r[0]["n_tokens_bpe"] == 8
    assert r[3]["n_tokens_ws"] == 10


def test_quality_score_monotone_in_length(spark):
    r = {x["doc_id"]: x for x in txt.quality_score(_docs(spark)).collect()}
    assert 0.0 <= r[3]["quality_score"] <= 1.0
    assert r[3]["stopword_ratio"] == pytest.approx(4 / 10, abs=1e-6)


def test_lang_id_markers(spark):
    r = {x["doc_id"]: x["lang_pred"] for x in txt.lang_id(_docs(spark)).collect()}
    assert r[3] == "en" and r[4] == "de"
    assert r[0] == "und"  # no markers at all


def test_fingerprint_equal_for_equal_text(spark):
    r = {x["doc_id"]: x for x in txt.fingerprint(_docs(spark)).collect()}
    assert r[0]["fp_md5"] == r[1]["fp_md5"]
    assert r[0]["fp_winnow"] == r[1]["fp_winnow"]
    assert r[0]["fp_md5"] != r[3]["fp_md5"]


def test_exact_dedup_groups(spark):
    r = {x["doc_id"]: x for x in dd.exact_dedup(_docs(spark)).collect()}
    assert r[1]["canonical_doc_id"] == 0 and r[1]["is_duplicate"]
    assert not r[0]["is_duplicate"] and not r[3]["is_duplicate"]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {
        (x["doc_a"], x["doc_b"]): x["jaccard"]
        for x in dd.ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates_contain_planted_dups(spark):
    pairs = {
        (x["doc_a"], x["doc_b"]): x["jaccard"]
        for x in dd.minhash_lsh_pairs(_docs(spark)).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs always collide in every band
    assert (0, 3) not in pairs or pairs[(0, 3)] < 0.2


def test_simhash_identical_and_hamming(spark):
    sig = {x["doc_id"]: x["simhash"] for x in dd.simhash(_docs(spark)).collect()}
    assert sig[0] == sig[1]
    assert 0 <= sig[0] < 2**32
    pairs = {(x["doc_a"], x["doc_b"]): x["hamming"] for x in dd.simhash_pairs(_docs(spark)).collect()}
    assert pairs[(0, 1)] == 0


def _emb(spark):
    # 4-dim toy embeddings with a known nearest-neighbor structure
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.98, 0.2, 0.0], 1),   # closest to 2
        (4, [-1.0, 0.0, 0.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ann_bruteforce_topk(spark):
    out = sim.ann_bruteforce_topk(_emb(spark), n_queries=3, top_k=1, dim=4)
    top1 = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert top1[0] == 1 and top1[1] == 0 and top1[2] == 3


def test_lsh_buckets_group_similar_vectors(spark):
    out = sim.lsh_bucketed_ann(_emb(spark), n_planes=4, top_k=2, dim=4)
    rows = out.collect()
    # identical-direction vectors must land in the same bucket and find
    # each other; opposite vectors must not be each other's neighbors
    got = {(r["vec_id"], r["neighbor_id"]) for r in rows}
    assert (0, 1) in got and (1, 0) in got
    assert (0, 4) not in got


def test_embedding_neardup_pairs(spark):
    out = sim.embedding_neardup_pairs(_emb(spark), threshold=0.9, n_planes=4, dim=4)
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in out.collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99


def test_multimodal_plumbing_fake_decode(spark):
    out = mm.multimodal_features(_docs(spark), fake_decode=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_bytes"] == len("alpha beta gamma delta epsilon zeta eta theta")
    assert rows[0]["header_byte"] == ord("a")
    assert rows[0]["modality"] == "image" and rows[1]["modality"] == "audio"
    assert rows[0]["content_hash"] == rows[1]["content_hash"]


def test_multimodal_decode_stub_raises_without_libs():
    with pytest.raises(NotImplementedError):
        mm._decode_stub(b"bytes", "image", fake=False)


def test_function_queries_stay_jvm_side(spark):
    # every text/dedup op must compile to pure Catalyst exprs — no
    # BatchEvalPython (row-at-a-time Python) anywhere (input_hint).
    for df in (
        txt.token_stats(_docs(spark)),
        txt.quality_score(_docs(spark)),
        dd.exact_dedup(_docs(spark)),
        dd.simhash(_docs(spark)),
        sim.ann_bruteforce_topk(_emb(spark), n_queries=2, top_k=1, dim=4),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
