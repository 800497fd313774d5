"""M3/M4/M5: per-entity LR embedding training + LR entity scorers.

Parity strategy: every NumPy kernel is checked against a deliberately
naive, loop-for-loop transcription of the reference Java
(`w2v/EntityEmbeddings.java:225-282`, `it/cnr/isti/hpc/LREntityScorer.java:
37-47`, `w2v/CustomLREntityScorer.java:40-61`); the Spark wrapper is then
checked for determinism under repartitioning and for actually separating
positives from negatives.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from fel_spark.operators import embeddings as EM
from fel_spark.operators.context import EmbeddingMatrix, broadcast_embeddings


def _naive_train_lr(X, y, C, max_iter, tol, w0):
    """Line-by-line transcription of trainLR2 (EntityEmbeddings.java:225-282)
    with float64 gradients and the integer-division bug fixed (see module
    docstring of fel_spark.operators.embeddings)."""
    C = C / 2.0
    N, d = X.shape
    w = w0.copy()
    alpha = 1.0
    pre = 100.0
    it = 0
    while True:
        cur = np.empty(N)
        acum_bias = 0.0
        for i in range(N):
            s = 1.0 / (1.0 + math.exp(-float(np.float64(X[i].astype(np.float64) @ w))))
            cur[i] = s - y[i]
            acum_bias += cur[i] * X[i][0]
        neww = w.copy()
        neww[0] = np.float32(w[0] - alpha * (1.0 / N) * acum_bias)
        for j in range(1, d):
            acum = 0.0
            for i in range(N):
                acum += cur[i] * X[i][j]
            neww[j] = np.float32(w[j] - alpha * ((1.0 / N) * (acum + C * w[j])))
        w = neww
        norm = (C / N) * float(np.float64(w.astype(np.float64) @ w.astype(np.float64)))
        ll = 0.0
        for i in range(N):
            s = 1.0 / (1.0 + math.exp(-float(np.float64(X[i].astype(np.float64) @ w))))
            if s > 0:
                v = y[i] * math.log(s) + (1 - y[i]) * math.log(1 - s) if 0 < s < 1 else 0.0
                if not math.isnan(v):
                    ll += v
        loss = norm - (1.0 / N) * ll
        it += 1
        if it > max_iter or abs(loss - pre) < tol:
            return w
        if loss > pre:
            alpha /= 2.0
        pre = loss


def test_train_lr_parity_vs_naive():
    rng = np.random.default_rng(7)
    d = 8
    X = rng.normal(size=(30, d)).astype(np.float32)
    y = np.concatenate([np.ones(15, dtype=np.int64), np.zeros(15, dtype=np.int64)])
    w0 = np.random.default_rng(EM.SEED).random(d, dtype=np.float32)
    got = EM.train_lr(X, y, C=10.0, max_iter=500, rng=np.random.default_rng(EM.SEED))
    want = _naive_train_lr(X, y, C=10.0, max_iter=500, tol=EM.TOLERANCE, w0=w0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_train_lr_separates():
    """Learned weights actually separate the two classes (positives around
    +mu, negatives around -mu)."""
    rng = np.random.default_rng(3)
    d = 16
    mu = rng.normal(size=d).astype(np.float32)
    pos = (mu + 0.1 * rng.normal(size=(40, d))).astype(np.float32)
    neg = (-mu + 0.1 * rng.normal(size=(40, d))).astype(np.float32)
    X = np.concatenate([pos, neg])
    y = np.concatenate([np.ones(40, dtype=np.int64), np.zeros(40, dtype=np.int64)])
    w = EM.train_lr(X, y, rng=np.random.default_rng(1))
    p = 1.0 / (1.0 + np.exp(-(X.astype(np.float64) @ w)))
    acc = ((p > 0.5).astype(int) == y).mean()
    assert acc >= 0.95, acc


def _tiny_emb(n_vocab=50, dim=6, seed=11):
    rng = np.random.default_rng(seed)
    keys = [f"w{i}" for i in range(n_vocab)]
    mat = rng.normal(size=(n_vocab, dim)).astype(np.float32)
    return EmbeddingMatrix({k: i for i, k in enumerate(keys)}, mat)


def test_training_examples_negatives_exclude_positives():
    emb = _tiny_emb()
    rng = np.random.default_rng(5)
    X, y = EM.training_examples(["w0", "w1", "oov", "w2"], emb, rho=20, rng=rng)
    assert (y == 1).sum() == 3  # oov dropped
    assert (y == 0).sum() == 20
    pos = emb.matrix[[0, 1, 2]]
    np.testing.assert_array_equal(X[:3], pos)
    # no negative row equals a positive row
    for neg in X[3:]:
        assert not any(np.array_equal(neg, p) for p in pos)


def test_lr_score_batch_parity_vs_naive():
    emb = _tiny_emb(dim=5)
    rng = np.random.default_rng(2)
    # 3 rows, each with some context words
    ctx = [[0, 3, 7], [], [4, 4, 9]]
    ev_custom = rng.normal(size=(3, 5)).astype(np.float32)
    ev_lr = rng.normal(size=(3, 6)).astype(np.float32)  # last dim = bias

    rows = np.concatenate(
        [np.full(len(c), i, dtype=np.int64) for i, c in enumerate(ctx)]
    )
    wv = emb.matrix[np.concatenate([c for c in ctx if c]).astype(int)].astype(
        np.float64
    )

    got_custom = EM.lr_score_batch(wv, rows, ev_custom.astype(np.float64), 3, custom=True)
    got_lr = EM.lr_score_batch(wv, rows, ev_lr.astype(np.float64), 3, custom=False)

    for i, c in enumerate(ctx):
        s_custom, s_lr = 0.0, 0.0
        for wid in c:
            w = emb.matrix[wid].astype(np.float64)
            s_custom += math.log(1 + math.exp(-float(w @ ev_custom[i].astype(np.float64))))
            s_lr += math.log(
                1
                + math.exp(
                    float(ev_lr[i][5]) + float(w @ ev_lr[i][:5].astype(np.float64))
                )
            )
        np.testing.assert_allclose(got_custom[i], -s_custom, rtol=1e-10)
        np.testing.assert_allclose(got_lr[i], -s_lr, rtol=1e-10)
    # empty context scores 0 (row 1)
    assert got_custom[1] == 0.0 and got_lr[1] == 0.0


def test_lr_score_batch_dim_check():
    wv = np.ones((1, 4))
    rows = np.zeros(1, dtype=np.int64)
    with pytest.raises(ValueError):
        EM.lr_score_batch(wv, rows, np.ones((1, 4)), 1, custom=False)  # wants 5
    with pytest.raises(ValueError):
        EM.lr_score_batch(wv, rows, np.ones((1, 5)), 1, custom=True)  # wants 4


def test_query_normalizer():
    emb = _tiny_emb(dim=4)
    wv = emb.matrix[:3].astype(np.float64)
    want = -sum(math.log(1 + math.exp(float(w @ w))) for w in wv)
    np.testing.assert_allclose(EM.query_normalizer(wv), want, rtol=1e-10)
    assert EM.query_normalizer(np.empty((0, 4))) == 1.0


def test_train_entity_embeddings_spark(spark):
    emb = _tiny_emb(n_vocab=60, dim=6)
    bc = broadcast_embeddings(spark, emb)
    rows = [
        ("_wiki_A", "w0 w1 w2 w3 w4"),
        ("_wiki_B", "w10 w11 w12"),
        ("_wiki_C", "oov only words"),  # no in-vocab token -> dropped
    ]
    desc = spark.createDataFrame(rows, "entity_key string, description string")
    out = EM.train_entity_embeddings(desc, bc).orderBy("entity_key")
    got = {r["entity_key"]: np.array(r["vector"]) for r in out.collect()}
    assert set(got) == {"_wiki_A", "_wiki_B"}
    assert got["_wiki_A"].shape == (6,)

    # deterministic under repartitioning (per-entity seeding, not a shared
    # sequential RNG): same vectors regardless of row order / partitioning
    out2 = EM.train_entity_embeddings(desc.repartition(5), bc)
    got2 = {r["entity_key"]: np.array(r["vector"]) for r in out2.collect()}
    for k in got:
        np.testing.assert_array_equal(got[k], got2[k])

    # the learned vector scores the entity's own description tokens higher
    # than random vocab rows (sigmoid > 0.5 on positives on average)
    w = got["_wiki_A"].astype(np.float64)
    pos = emb.matrix[:5].astype(np.float64)
    p_pos = 1 / (1 + np.exp(-(pos @ w)))
    assert p_pos.mean() > 0.5


def test_span_context_scores_custom_lr(spark):
    """End-to-end scorer option through the pandas-UDF harness."""
    from fel_spark.operators.context import span_context_scores

    emb = _tiny_emb(n_vocab=30, dim=6)
    bc = broadcast_embeddings(spark, emb)
    rows = [
        # toks: w0 w1 [w2=span] w3 w4 ; entity w5
        ("w5", ["w0", "w1", "w2", "w3", "w4"], 3, 1, 2),
    ]
    df = spark.createDataFrame(
        rows, "entity_key string, toks array<string>, start int, length int, n_cands int"
    )
    out = span_context_scores(
        df, bc, window=2, skip_col="n_cands", scorer="custom_lr"
    ).collect()[0]
    e = emb.matrix[5].astype(np.float64)
    want = -sum(
        math.log(1 + math.exp(-float(emb.matrix[i].astype(np.float64) @ e)))
        for i in (0, 1, 3, 4)  # window, span excluded
    )
    np.testing.assert_allclose(out["context_score"], want, rtol=1e-6)


def test_span_context_scores_bigrams(spark):
    """M8: w_{i-1}_w_i bigram pseudo-words join the context exactly like
    EntityContext.setContextWords (view/EntityContext.java:31-40)."""
    import numpy as np

    from fel_spark.operators.context import span_context_scores

    rng = np.random.default_rng(4)
    keys = ["w0", "w1", "w2", "w3", "w4", "ENT", "w0_w1", "w3_w4"]
    mat = rng.normal(size=(len(keys), 5)).astype(np.float32)
    emb = EmbeddingMatrix({k: i for i, k in enumerate(keys)}, mat)
    bc = broadcast_embeddings(spark, emb)

    # toks = w0 w1 [w2=span] w3 w4, window=2 -> context w0 w1 w3 w4;
    # bigrams over the filtered list: w0_w1 (hit), w1_w3 (OOV), w3_w4 (hit)
    rows = [("ENT", ["w0", "w1", "w2", "w3", "w4"], 3, 1, 2)]
    df = spark.createDataFrame(
        rows, "entity_key string, toks array<string>, start int, length int, n_cands int"
    )

    def score(use_bigrams):
        return span_context_scores(
            df, bc, window=2, skip_col="n_cands", use_bigrams=use_bigrams
        ).collect()[0]["context_score"]

    e = mat[5].astype(np.float64)
    uni = mat[[0, 1, 3, 4]].astype(np.float64).sum(axis=0)
    both = uni + mat[6].astype(np.float64) + mat[7].astype(np.float64)
    np.testing.assert_allclose(score(False), float(e @ uni) / np.linalg.norm(uni), rtol=1e-6)
    np.testing.assert_allclose(score(True), float(e @ both) / np.linalg.norm(both), rtol=1e-6)


def test_entity_phrase_similarity(spark):
    """C4 parity: mean cosine over unigram+bigram vocab hits
    (entity2WordSimilarity, CompressedSingleFileEntitySimilarityUtil.java:57-79)."""
    import numpy as np

    from fel_spark.operators.context import entity_phrase_similarity

    rng = np.random.default_rng(9)
    keys = ["w0", "w1", "w0_w1", "ENT"]
    mat = rng.normal(size=(4, 5)).astype(np.float32)
    emb = EmbeddingMatrix({k: i for i, k in enumerate(keys)}, mat)
    bc = broadcast_embeddings(spark, emb)
    df = spark.createDataFrame(
        [("ENT", "w0 w1 oov"), ("ENT", "oov1 oov2"), ("MISSING", "w0")],
        "entity_key string, phrase string",
    )
    got = [r["entity_phrase_sim"] for r in entity_phrase_similarity(df, bc).collect()]

    def cos(a, b):
        a, b = a.astype(np.float64), b.astype(np.float64)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    e = mat[3]
    # hits: w0, w1, w0_w1 (bigram); oov contributes nothing
    want0 = (cos(e, mat[0]) + cos(e, mat[1]) + cos(e, mat[2])) / 3
    np.testing.assert_allclose(got[0], want0, rtol=1e-6)
    assert got[1] == 0.0  # no word hits
    assert got[2] == 0.0  # entity OOV
