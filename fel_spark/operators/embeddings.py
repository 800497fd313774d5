"""Per-entity LR embedding training + LR entity scorers (M3/M4/M5).

Spark-first restatement of the reference's second pillar — learning entity
embeddings by regularized logistic regression over word-vector features with
negative sampling, and scoring entities against a context with the learned
LR weights:

- training   (`w2v/EntityEmbeddings.java:151-282`): per entity, positives =
  word vectors of the entity's description tokens, negatives = rho uniform
  vocabulary samples excluding the positive words; full-batch gradient
  descent, L2-regularized except the first weight ("bias" — the reference
  regularizes w[1:] only, `:241-249`), learning rate 1.0 halved whenever the
  loss increases (`:271`), tolerance 1e-5, maxIter 50000, paper params
  lambda=10 rho=20 (`:47-48`), alpha(C)=10 (`:101`), seed 1234 (`:66`).
- LR scorer  (`it/cnr/isti/hpc/LREntityScorer.java:28-48`): score =
  -sum_w count_w * log(1 + exp(bias + <w_vec, e_vec>)) with the bias stored
  as the entity vector's LAST dimension (entity model is d+1 wide).
- custom LR  (`w2v/CustomLREntityScorer.java:33-61`): same-width models,
  no bias, NEGATED dot: -sum_w count_w * log(1 + exp(-<w_vec, e_vec>)),
  plus the query normalizer -sum_w count_w * log(1 + exp(<w,w>)) (or 1
  when zero) — computed but unused by the default ranker
  (`entityranker/ContextualRanker.java:42`, corr = 1).

Distribution shape: training is embarrassingly parallel per entity —
one Arrow batch of (entity, description) rows in, NumPy GD per entity,
vectors out (mapInPandas; the word matrix rides the existing broadcast).
Deliberate deviations from the Java, documented for the parity tests:

- per-entity RNG: the reference threads ONE java.util.Random(1234) through
  every entity sequentially, so results depend on input file order — not
  reproducible under any parallel execution (its own Hadoop mapper re-seeds
  per task too). We derive a per-entity seed = (seed, sha256(entity_key))
  so output is independent of partitioning and row order.
- the reference's convergence test multiplies the data likelihood by the
  Java INTEGER expression ``1 / N`` (zero for N > 1,
  `EntityEmbeddings.java:267`), silently reducing its loss to the
  regularizer norm alone; we use the real 1.0/N.
- log(1 + exp(x)) is computed as logaddexp(0, x) (overflow-stable).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

LAMBDA_C = 10.0  # EntityEmbeddings.java:101 (alpha passed as C)
RHO = 20  # paper value, EntityEmbeddings.java:47-48
MAX_ITER = 50_000  # :226
TOLERANCE = 1e-5  # :229
SEED = 1234  # :66
MAX_WORDS = 150  # mapper default, :289


def _entity_seed(entity_key: str, seed: int = SEED) -> int:
    h = hashlib.sha256(entity_key.encode("utf-8")).digest()
    return (seed << 32) ^ int.from_bytes(h[:4], "little")


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def train_lr(
    X: np.ndarray,
    y: np.ndarray,
    C: float = LAMBDA_C,
    max_iter: int = MAX_ITER,
    tol: float = TOLERANCE,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Vectorized trainLR2 (`EntityEmbeddings.java:225-282`).

    Full-batch GD on sigmoid loss; w[0] unregularized; lr starts at 1.0 and
    halves whenever the loss increases; stops when |loss - prev| < tol.
    """
    C = C / 2.0  # :226 (C = C/2)
    N, d = X.shape
    rng = np.random.default_rng(SEED) if rng is None else rng
    w = rng.random(d, dtype=np.float32)  # uniform [0,1) like initWeights
    Xf = X.astype(np.float64)
    yf = y.astype(np.float64)
    lr = 1.0
    pre = 100.0  # :230 (preLik = 100)
    for _ in range(max_iter):
        s = _sigmoid(Xf @ w) - yf  # currentScores
        grad = Xf.T @ s / N
        reg = (C / N) * w
        reg[0] = 0.0  # bias dim unregularized (:241)
        w = (w - lr * (grad + reg)).astype(np.float32)
        # loss = (C/N)*||w||^2 - (1/N)*sum(y log p + (1-y) log(1-p))
        p = _sigmoid(Xf @ w)
        with np.errstate(divide="ignore", invalid="ignore"):
            ll = yf * np.log(p) + (1.0 - yf) * np.log(1.0 - p)
        ll = np.nansum(np.where(np.isneginf(ll), 0.0, ll))
        loss = (C / N) * float(w @ w) - ll / N
        if abs(loss - pre) < tol:
            break
        if loss > pre:
            lr /= 2.0
        pre = loss
    return w


def training_examples(
    tokens: list[str],
    emb,
    rho: int = RHO,
    max_words: int = MAX_WORDS,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """getVectors (`EntityEmbeddings.java:151-190`): positives = in-vocab
    token vectors (first ``max_words``), negatives = ``rho`` uniform vocab
    rows excluding the positive words (rho < 0 -> |positives|)."""
    rng = np.random.default_rng(SEED) if rng is None else rng
    ids = emb.ids_for(np.asarray(tokens, dtype=object)) if tokens else np.empty(0, np.int64)
    pos_ids = ids[ids >= 0][: max_words + 1]  # ref breaks AFTER adding (:164)
    pos_set = set(pos_ids.tolist())
    n_vocab = emb.matrix.shape[0]
    n_neg = len(pos_ids) if rho < 0 else rho
    neg: list[int] = []
    while len(neg) < n_neg:
        cand = rng.integers(0, n_vocab, size=max(n_neg, 8))
        neg.extend(int(c) for c in cand if int(c) not in pos_set)
    neg_ids = np.asarray(neg[:n_neg], dtype=np.int64)
    X = np.concatenate([emb.matrix[pos_ids], emb.matrix[neg_ids]], axis=0)
    y = np.concatenate(
        [np.ones(len(pos_ids), dtype=np.int64), np.zeros(n_neg, dtype=np.int64)]
    )
    return X, y


def train_entity_embedding(
    entity_key: str,
    tokens: list[str],
    emb,
    rho: int = RHO,
    C: float = LAMBDA_C,
    max_iter: int = MAX_ITER,
    max_words: int = MAX_WORDS,
    seed: int = SEED,
) -> np.ndarray | None:
    """One entity: examples -> LR weights. None when no in-vocab token
    (the reference emits nothing for ex.y.length == 0, :306)."""
    rng = np.random.default_rng(_entity_seed(entity_key, seed))
    X, y = training_examples(tokens, emb, rho=rho, max_words=max_words, rng=rng)
    if not (y > 0).any():
        return None
    return train_lr(X, y, C=C, max_iter=max_iter, rng=rng)


def train_entity_embeddings(
    descriptions: DataFrame,
    bc_emb,
    key_col: str = "entity_key",
    text_col: str = "description",
    rho: int = RHO,
    C: float = LAMBDA_C,
    max_iter: int = MAX_ITER,
    max_words: int = MAX_WORDS,
    seed: int = SEED,
) -> DataFrame:
    """(entity_key, description) -> (entity_key, vector array<float>).

    mapInPandas: one NumPy GD per entity inside the Arrow batch; the word
    matrix is the session's broadcast EmbeddingMatrix. Tokenization matches
    the reference's split on whitespace (`EntityEmbeddings.java:152`) — the
    input is expected pre-normalized, exactly like the reference's
    entity-description file.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emb = bc_emb.value
        for pdf in batches:
            keys, vecs = [], []
            for k, txt in zip(pdf[key_col], pdf[text_col]):
                if k is None or txt is None:
                    continue
                w = train_entity_embedding(
                    k,
                    txt.split(),
                    emb,
                    rho=rho,
                    C=C,
                    max_iter=max_iter,
                    max_words=max_words,
                    seed=seed,
                )
                if w is not None:
                    keys.append(k)
                    vecs.append(w.astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "entity_key": pd.Series(keys, dtype=object),
                    "vector": pd.Series(vecs, dtype=object),
                }
            )

    return descriptions.select(key_col, text_col).mapInPandas(
        gen, schema="entity_key string, vector array<float>"
    )


# ---------------------------------------------------------------------------
# M4/M5: LR entity scorers (NumPy kernels used by context.span_context_scores)
# ---------------------------------------------------------------------------


def lr_score_batch(
    word_vecs: np.ndarray,
    word_rows: np.ndarray,
    entity_vecs: np.ndarray,
    n_rows: int,
    custom: bool = False,
) -> np.ndarray:
    """Batched LR context scores.

    ``word_vecs``: (n_ctx_words, d) context-word vectors (one per occurrence
    — summing per occurrence equals the reference's count-weighted multiset,
    `EntityScorer.java:67-85`); ``word_rows``: (n_ctx_words,) which output
    row each belongs to; ``entity_vecs``: (n_rows, d) for custom=True
    (`CustomLREntityScorer.java:40-46`, negated dot, no bias) or
    (n_rows, d+1) for custom=False (`LREntityScorer.java:37-47`, last
    dimension = bias). Returns (n_rows,) scores; rows with no context words
    score 0.
    """
    if len(word_rows) == 0:
        return np.zeros(n_rows, dtype=np.float64)
    d = word_vecs.shape[1]
    want = d if custom else d + 1  # constructor dim checks in both scorers
    if entity_vecs.shape[1] != want:
        raise ValueError(
            f"entity model must be {want}-wide for this scorer, "
            f"got {entity_vecs.shape[1]} (word dim {d})"
        )
    if custom:
        dots = -np.einsum("ij,ij->i", word_vecs, entity_vecs[word_rows, :d])
    else:
        bias = entity_vecs[word_rows, d]
        dots = bias + np.einsum("ij,ij->i", word_vecs, entity_vecs[word_rows, :d])
    contrib = np.logaddexp(0.0, dots)  # log(1 + exp(dots)), overflow-stable
    return -np.bincount(word_rows, weights=contrib, minlength=n_rows)


def query_normalizer(word_vecs: np.ndarray) -> float:
    """CustomLRScorerContext.queryNormalizer (`CustomLREntityScorer.java:48-61`):
    -sum log(1+exp(<w,w>)) over context words, or 1.0 when zero."""
    if len(word_vecs) == 0:
        return 1.0
    s = float(np.logaddexp(0.0, np.einsum("ij,ij->i", word_vecs, word_vecs)).sum())
    return -s if s != 0 else 1.0
