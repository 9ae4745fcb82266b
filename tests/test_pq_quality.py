"""PQ ANN (pipeline/pq.py): determinism, compression shape, recall
floor vs brute force; quality gates (pipeline/quality.py): perplexity
ordering and Gopher rule battery."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.pipeline.pq import (
    build_pq_index,
    pq_ann_topk,
    pq_encode,
    pq_train,
)
from go_mysql_elasticsearch_spark.pipeline.quality import (
    gopher_quality,
    unigram_perplexity,
)


@pytest.fixture(scope="module")
def emb(spark):
    """Deterministic clustered embeddings: 4 well-separated centers in
    64-dim, 30 points each with small content-hash jitter — so ANN has
    real cluster structure to find."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 64)) * 5.0
    rows = []
    for i in range(120):
        c = i % 4
        jit = np.asarray(
            [math.sin(i * 13.7 + d) * 0.3 for d in range(64)]
        )
        rows.append((i, [float(x) for x in centers[c] + jit]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_train_encode_deterministic(spark, emb):
    cb1 = pq_train(emb, m=2, ks=4, iters=2)
    cb2 = pq_train(emb, m=2, ks=4, iters=2)
    assert cb1 == cb2  # seedless: bit-identical across runs
    assert len(cb1) == 2 and len(cb1[0]) == 4 and len(cb1[0][0]) == 32
    codes = pq_encode(emb, cb1).orderBy("vec_id").collect()
    assert len(codes) == 120
    # codes are per-subspace cluster ids in range
    assert all(0 <= r["code0"] < 4 and 0 <= r["code1"] < 4 for r in codes)
    # clustered input ⇒ same-cluster points mostly share codes
    by_cluster = {}
    for r in codes:
        by_cluster.setdefault(r["vec_id"] % 4, set()).add((r["code0"], r["code1"]))
    assert sum(len(v) for v in by_cluster.values()) <= 8  # tight codebooks


def test_pq_index_persists_and_resumes(spark, emb, tmp_path):
    p = str(tmp_path / "pqidx")
    codes1, cb1 = build_pq_index(spark, emb, p, m=2, ks=4, iters=2)
    codes2, cb2 = build_pq_index(spark, emb, p, m=2, ks=4, iters=2)  # resume no-op
    assert cb1 == cb2
    assert codes1.count() == codes2.count() == 120


def test_pq_recall_vs_bruteforce(spark, emb, tmp_path):
    """ADC top-k (with re-rank) must recover most of the exact top-k —
    the standard PQ recall check, deterministic here."""
    from go_mysql_elasticsearch_spark.pipeline.similarity import cosine_topk

    p = str(tmp_path / "pqidx2")
    codes, cbs = build_pq_index(spark, emb, p, m=2, ks=8, iters=3)
    k = 10
    exact = {r["vec_id"] for r in cosine_topk(emb, query_vec_id=0, k=k).collect()}
    approx = {r["vec_id"] for r in
              pq_ann_topk(emb, codes, cbs, 0, k=k, rerank=40).collect()}
    recall = len(exact & approx) / k
    assert recall >= 0.8, (recall, exact, approx)


def test_pq_adc_plan_is_catalyst_only(spark, emb, tmp_path):
    """The ADC candidate scan must be a pure-Catalyst projection over
    the code table: no join, no Exchange other than the final top-R
    ordering, and NO Python eval (the LUT rides as plan literals) —
    that is the property that lets a 10^10-row code table scan stay
    JVM-side."""
    p = str(tmp_path / "pqidx3")
    codes, cbs = build_pq_index(spark, emb, p, m=2, ks=4, iters=2)
    df = pq_ann_topk(emb, codes, cbs, 0, k=5, rerank=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one join in the whole query: the k-row exact re-rank
    assert plan.count("Join") <= 2, plan  # one join node + its reuse line
    # the candidate side reads only the code table columns
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_unigram_perplexity_orders_text_plausibly(spark):
    """A doc of corpus-common tokens scores LOWER perplexity than a doc
    of hapaxes; ppl of a uniform doc equals the closed form."""
    docs = spark.createDataFrame(
        [
            (0, "the the the the"),
            (1, "qzx wvu jkl mno"),
            (2, "the qzx the wvu"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in unigram_perplexity(docs).collect()}
    assert got[0] < got[2] < got[1]
    # closed form: 'the' appears 6 times in the 12-token corpus, so
    # doc 0 (all 'the') has ppl = 1/p = 2
    assert got[0] == pytest.approx(2.0, abs=1e-3)
    assert got[2] == pytest.approx(math.sqrt(12.0), abs=1e-3)


def test_gopher_rules(spark):
    common = " ".join(["the quick brown fox jumps of a to and"] * 8)  # 72 words
    docs = spark.createDataFrame(
        [
            (0, common),                      # passes everything
            (1, "short doc the a"),           # too few words
            (2, " ".join(["x1"] * 80)),       # non-alphabetic tokens, no stopwords
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert got[0]["passes"] == 1
    assert got[1]["passes"] == 0 and got[1]["n_words"] == 4
    assert got[2]["passes"] == 0 and got[2]["alpha_frac"] < 0.8
