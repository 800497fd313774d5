"""Incremental (Structured Streaming) entity linking.

The reference is batch-only (Hadoop MR / Pig); a production transcript store
receives new conversations continuously, so the engine exposes a streaming
path for the per-turn stages:

- linking (normalize -> span explode -> broadcast dict join -> prior
  ranking) is stateless per turn -> runs unchanged on a streaming DataFrame;
- per-turn segmentation needs the whole turn (one row) -> still stateless;
- watermarked windowed aggregation powers the ops metrics stream
  (mentions/minute per entity);
- clustering is transitive/global -> stays a periodic batch job over the
  accumulated mention log (the standard lambda split: streaming attach of
  the *current* cluster map via broadcast join, batch recompute of the map).

All operators here accept either a batch or a streaming DataFrame — they
use only streaming-compatible transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fel_spark.sources.synth import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of transcript parquet drops (the Iceberg/object-
    store landing pattern: writers append files, the stream tails them)."""
    schema = TRANSCRIPT_SCHEMA.replace(
        ", mentions array<struct<mention_idx:int, alias:string, entity_id:int, token_start:int>>",
        "",
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def link_stream(transcript_stream: DataFrame, cand_dict: DataFrame) -> DataFrame:
    """Stateless streaming linking: spans -> broadcast top-1 dict join.

    The candidate argmax moves DICTIONARY-side (batch DF, window allowed):
    the stream joins against the per-alias best-prior candidate, so every
    streaming row is one stateless lookup — exact for unambiguous aliases,
    top-prior for ambiguous ones (the contextual re-rank and segmentation
    DP stay in the batch path).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("alias").orderBy(F.desc("phase1"), F.asc("entity_id"))
    top1 = (
        cand_dict.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    # span explode with ts carried through (a streaming self-join to
    # re-attach ts would need watermark state; carrying the column is free)
    from fel_spark.functions.text import all_spans, normalize_tokens

    toks = transcript_stream.select(
        "conv_id", "turn_idx", "ts", normalize_tokens("text").alias("toks")
    )
    spans = (
        toks.filter(F.size("toks") > 0)
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            F.explode(all_spans(F.col("toks"), 4)).alias("sp"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            F.col("sp.span").alias("span"),
            F.col("sp.start").alias("start"),
            F.col("sp.length").alias("length"),
        )
    )
    return spans.join(F.broadcast(top1), spans["span"] == top1["alias"])


def mention_rate_stream(linked: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked windowed aggregation: mentions per entity per window."""
    return (
        linked.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", window), "entity_id")
        .agg(F.count("*").alias("n_mentions"))
    )


def session_rollup_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming counterpart of ``operators/sessions.py``: Spark's native
    ``session_window`` merges a user's events closer than ``gap`` into one
    growing window; the watermark bounds state, so closed sessions emit and
    their state evicts — the only formulation whose state stays O(open
    sessions) on an unbounded stream.

    Boundary note: session_window is half-open ([start, last+gap)), so an
    event arriving at EXACTLY ``gap`` starts a new session here, while the
    batch operator's strict-``>`` rule keeps it — document, don't hide:
    the two agree everywhere except that zero-measure boundary.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: incremental per-block cluster assignment
# ---------------------------------------------------------------------------

INCR_CLUSTER_OUT = "block_key string, rep_id string, cluster_id string"
_INCR_STATE = (
    "rep_ids array<string>, rep_toks array<string>, cluster_ids array<string>"
)


def incremental_cluster_stream(
    reps_stream: DataFrame,
    threshold: float = 0.5,
    max_registry: int = 500,
    timeout_minutes: int = 30,
) -> DataFrame:
    """Streaming incremental near-dup cluster assignment
    (``applyInPandasWithState``): the stateful analogue of the batch
    blocking -> pair -> CC chain for the *attach* side of the lambda split.

    Input: a streaming DataFrame of (block_key, rep_id, toks:array<string>)
    — new mention representatives with their blocking key. Per block key
    the operator keeps a bounded registry of seen representatives; each new
    rep adopts the cluster of the first stored rep within token-set Jaccard
    >= ``threshold``, else opens a new cluster (cluster_id = own rep_id —
    the same min-id-is-label determinism as batch CC). Global transitive
    closure across block keys remains the periodic batch job; this operator
    gives streaming rows a stable, immediately-usable cluster id with
    single-key state locality (state shuffles once by block_key, exactly
    like the batch pair join).

    Scale posture: state per key is capped at ``max_registry`` entries
    (same bound as blocking.cap_blocks — a hot key degrades to
    first-``max_registry`` representatives instead of unbounded state), and
    idle keys expire after ``timeout_minutes`` of processing time. The
    registry comparison is small-times-small per micro-batch (new reps x
    capped registry), never corpus-scale.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd

    import numpy as np

    def assign(key, pdfs, state: GroupState):
        if state.exists:
            rep_ids, rep_toks, cluster_ids = state.get
            rep_ids, rep_toks, cluster_ids = (
                list(rep_ids),
                list(rep_toks),
                list(cluster_ids),
            )
        else:
            rep_ids, rep_toks, cluster_ids = [], [], []
        tok_sets = [set(t.split()) for t in rep_toks]

        # Vectorized registry probe: one token->column vocab over registry +
        # batch, registry as a bounded binary incidence matrix; each new rep
        # is ONE matvec (intersections vs the whole registry) instead of an
        # O(registry) Python set-op scan. Rows stay sequential because a new
        # rep can adopt a cluster opened earlier in the same micro-batch.
        batches = list(pdfs)
        vocab: dict = {}
        for s in tok_sets:
            for t in s:
                vocab.setdefault(t, len(vocab))
        for pdf in batches:
            for toks in pdf["toks"]:
                for t in toks:
                    vocab.setdefault(t, len(vocab))
        V = max(len(vocab), 1)
        R = np.zeros((max_registry, V), dtype=np.int8)
        sizes = np.zeros(max_registry, dtype=np.int64)
        k = len(tok_sets)
        for i, s in enumerate(tok_sets):
            if s:
                R[i, [vocab[t] for t in s]] = 1
            sizes[i] = len(s)

        out_ids, out_cids = [], []
        for pdf in batches:
            for rid, toks in zip(pdf["rep_id"], pdf["toks"]):
                tset = set(toks)
                m = np.zeros(V, dtype=np.int8)
                if tset:
                    m[[vocab[t] for t in tset]] = 1
                cid = None
                if k:
                    inter = R[:k] @ m.astype(np.int64)
                    union = sizes[:k] + len(tset) - inter
                    # same FP comparison as the scalar form (int/int division
                    # in float64, then >= threshold) — no t*union rewrite,
                    # which could flip at representation boundaries
                    with np.errstate(divide="ignore", invalid="ignore"):
                        jac = inter / np.where(union == 0, 1, union)
                    hits = (union > 0) & (jac >= threshold)
                    if hits.any():
                        cid = cluster_ids[int(np.argmax(hits))]
                if cid is None:
                    cid = rid
                if k < max_registry:
                    rep_ids.append(rid)
                    rep_toks.append(" ".join(sorted(tset)))
                    cluster_ids.append(cid)
                    R[k] = m
                    sizes[k] = len(tset)
                    k += 1
                out_ids.append(rid)
                out_cids.append(cid)

        state.update((rep_ids, rep_toks, cluster_ids))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "block_key": [key[0]] * len(out_ids),
                "rep_id": out_ids,
                "cluster_id": out_cids,
            }
        )

    return reps_stream.groupBy("block_key").applyInPandasWithState(
        assign,
        outputStructType=INCR_CLUSTER_OUT,
        stateStructType=_INCR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def cms_cells_stream(
    stream: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Streaming Count-Min maintenance: the sketch IS the textbook
    streaming summary (Cormode & Muthukrishnan 2005 define it over a
    stream), and `sketches.count_min_cells` is a pure explode + hash
    aggregate — no window, no sort — so it runs UNCHANGED as a
    Structured Streaming aggregation (complete/update output). The
    memory-sink equivalence test pins stream == batch cell-for-cell;
    at deploy scale the d*w-cell state is a constant regardless of key
    cardinality, which is the whole point."""
    from fel_spark.operators.sketches import count_min_cells

    return count_min_cells(stream, key_col, depth=depth, width=width)


def hll_registers_stream(
    stream: DataFrame, key_col: str, b: int = 8
) -> DataFrame:
    """Streaming HyperLogLog maintenance: register max is an order-free
    monotone aggregate, so `sketches.hll_registers` runs unchanged over
    a stream — approximate distinct-keys-so-far from 2^b rows of
    state. Stream == batch register-for-register (memory-sink test)."""
    from fel_spark.operators.sketches import hll_registers

    return hll_registers(stream, key_col, b=b)
