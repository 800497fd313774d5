"""Deterministic synthetic transcript corpus + alias dictionary + embeddings.

Implements the FIXTURES.md schemas:

1. ``transcripts`` (conv_id, turn_idx, role, text, tool, ts) — BASELINE
   input_hint shape — generated *distributively* (mapInPandas over
   spark.range) so the same generator scales from 1k turns (unit tests) to
   bench scale without a driver-side materialization. All randomness is
   counter-based (splitmix64 of the row id), so output is identical at any
   parallelism / partition count — no rand(), no partition-dependence.
2. ``alias_dict`` — the datapack analogue (FEL datapack line fields,
   `hash/FormatReader.java:96-130`; field glossary
   `view/CandidatesInfo.java:22-30`, `view/Entity.java:28-34`).
3. ``embeddings`` — quantized vectors, header semantics of
   `w2v/Quantizer.java:62-80` (store int(|v|*q)*sign(v); dequantize
   (v + 0.5*sign(v))/q per `it/cnr/isti/hpc/Word2VecCompress.java:96-97`).
4. ground-truth mentions for labeled_pairs / F1 evaluation.

Zipf(1.1) alias popularity plants the hot-key skew the blocking stage must
handle; ~10% of mentions use a typo variant and ~20% an ambiguous short
alias, so fuzzy + contextual scoring matters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

QUANT_Q = 9
EMB_DIM = 32  # multiple of 4, mirroring LinearAlgebra.java:21-23

FILLERS = (
    "the a of and to in on for with at from by about as into over after "
    "please can you tell me more show find what is how does work"
).split()
TOOLS = ("search", "calculator", "browser", "code_interpreter")

_FIRST_SYL = ["ka", "ro", "mi", "ta", "ve", "lu", "sa", "do", "ne", "pi"]
_LAST_SYL = ["mar", "lin", "son", "ber", "tov", "den"]


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the counter-based PRNG core."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _GOLDEN) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * _MIX1) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * _MIX2) & _MASK
        return z ^ (z >> np.uint64(31))


def u01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic U[0,1) per id, independent across streams."""
    h = splitmix64(ids.astype(np.uint64) ^ splitmix64(np.uint64((seed << 16) + stream)))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _entity_name(i: int, rng: np.random.RandomState) -> str:
    first = "".join(rng.choice(_FIRST_SYL, 2)) + _FIRST_SYL[i % len(_FIRST_SYL)]
    last = "".join(rng.choice(_LAST_SYL, 2))
    return f"{first} {last}"


@dataclass
class DictPack:
    """Driver-side dictionary bundle (small: broadcast-sized by design —
    the reference datapack is required to fit per node, README.md:10)."""

    n_entities: int
    seed: int
    entities: pd.DataFrame  # entity_id, name, type, popularity
    alias_rows: pd.DataFrame  # FIXTURES.md §2 columns
    embeddings: pd.DataFrame  # key, vec (list[int16])
    topic_words: list[list[str]] = field(default_factory=list)
    # per-entity alias choices: list of (alias, cumulative-weight)
    alias_choices: list[list[tuple[str, float]]] = field(default_factory=list)
    zipf_cdf: np.ndarray | None = None


def _typo(token: str) -> str:
    """Deterministic typo: drop the 3rd char (len>3) else duplicate last."""
    if len(token) > 3:
        return token[:2] + token[3:]
    return token + token[-1]


def build_dict_pack(n_entities: int = 200, seed: int = 42) -> DictPack:
    rng = np.random.RandomState(seed)

    # --- entities with Zipf popularity ---------------------------------
    names: list[str] = []
    seen: set[str] = set()
    for i in range(n_entities):
        nm = _entity_name(i, rng)
        while nm in seen:
            nm = _entity_name(i, rng)
        seen.add(nm)
        names.append(nm)
    ranks = np.arange(1, n_entities + 1, dtype=np.float64)
    w = 1.0 / ranks**1.1
    w /= w.sum()
    cdf = np.cumsum(w)

    entities = pd.DataFrame(
        {
            "entity_id": np.arange(n_entities, dtype=np.int32),
            "name": names,
            "type": (np.arange(n_entities) % 7).astype(np.int16),
            "popularity": w,
        }
    )

    # --- topic words (context vocabulary, entity-correlated) -----------
    topic_words = [
        [f"{names[e].split()[0]}topic{k}" for k in range(6)] for e in range(n_entities)
    ]
    # make topic words unique per entity (first token may repeat across
    # entities — suffix with entity id when colliding)
    seen_w: set[str] = set()
    for e in range(n_entities):
        for k in range(6):
            wname = topic_words[e][k]
            if wname in seen_w:
                wname = f"{wname}e{e}"
                topic_words[e][k] = wname
            seen_w.add(wname)

    # --- aliases --------------------------------------------------------
    # canonical full name (w=.6), last token (ambiguous, w=.2),
    # typo of canonical (w=.1), first token if globally unique (w=.1)
    first_counts: dict[str, int] = {}
    for nm in names:
        t0 = nm.split()[0]
        first_counts[t0] = first_counts.get(t0, 0) + 1

    alias_entity: dict[str, dict[int, float]] = {}
    alias_choices: list[list[tuple[str, float]]] = []
    for e in range(n_entities):
        toks = names[e].split()
        cands: list[tuple[str, float]] = [(names[e], 0.6), (toks[-1], 0.2)]
        cands.append((f"{_typo(toks[0])} {toks[-1]}", 0.1))
        if first_counts[toks[0]] == 1:
            cands.append((toks[0], 0.1))
        else:
            cands[0] = (names[e], 0.7)
        total = sum(p for _, p in cands)
        acc, cum = 0.0, []
        for alias, p in cands:
            acc += p / total
            cum.append((alias, acc))
            alias_entity.setdefault(alias, {})
            alias_entity[alias][e] = alias_entity[alias].get(e, 0.0) + (p / total) * w[e]
        alias_choices.append(cum)

    # --- datapack counts (FIXTURES.md §2) -------------------------------
    rows = []
    scale = 1_000_000.0
    for alias, emap in alias_entity.items():
        qaf_alias = int(sum(emap.values()) * scale) + len(emap)
        for e, we in emap.items():
            qaef = int(we * scale) + 1
            rows.append(
                {
                    "alias": alias,
                    "QAF": qaf_alias,
                    "QAT": int(qaf_alias * 1.3) + 2,
                    "QAC": int(qaf_alias * 0.8) + 1,
                    "LAF": qaf_alias,
                    "LAT": int(qaf_alias * 1.5) + 2,
                    "entity_id": np.int32(e),
                    "type": np.int16(e % 7),
                    "QAEF": qaef,
                    "LAET": qaef,
                }
            )
    alias_rows = pd.DataFrame(rows)
    # entity marginals: QEF/LET = sum of QAEF/LAET over the entity's aliases
    qef = alias_rows.groupby("entity_id")["QAEF"].sum().rename("QEF")
    alias_rows = alias_rows.merge(qef, on="entity_id")
    alias_rows["LET"] = alias_rows["QEF"]

    # --- embeddings (quantized, entity-correlated topics) ---------------
    t_vecs = rng.randn(n_entities, EMB_DIM)
    t_vecs /= np.linalg.norm(t_vecs, axis=1, keepdims=True)
    emb_rows = []

    def quantize(v: np.ndarray) -> list[int]:
        qv = np.sign(v) * np.floor(np.abs(v) * QUANT_Q)
        return [int(x) for x in qv.astype(np.int16)]

    for e in range(n_entities):
        key = "_wiki_" + names[e].replace(" ", "_")
        # entity vectors carry a larger norm than word vectors: the context
        # term is FEL's dominant signal (its LR context scores are log-
        # likelihoods with ranges well beyond the log-prior gaps), so the
        # synthetic mirrors that scale relationship.
        emb_rows.append({"key": key, "vec": quantize(t_vecs[e] * 10.0)})
        for wname in topic_words[e]:
            v = 0.92 * t_vecs[e] + 0.40 * rng.randn(EMB_DIM) / np.sqrt(EMB_DIM)
            v = v / np.linalg.norm(v) * 3.0
            emb_rows.append({"key": wname, "vec": quantize(v)})
    for fw in FILLERS:
        v = rng.randn(EMB_DIM)
        v = v / np.linalg.norm(v) * 3.0
        emb_rows.append({"key": fw, "vec": quantize(v)})
    embeddings = pd.DataFrame(emb_rows)

    return DictPack(
        n_entities=n_entities,
        seed=seed,
        entities=entities,
        alias_rows=alias_rows,
        embeddings=embeddings,
        topic_words=topic_words,
        alias_choices=alias_choices,
        zipf_cdf=cdf,
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, mentions array<struct<mention_idx:int, alias:string, "
    "entity_id:int, token_start:int>>"
)


def synth_transcripts_df(
    spark: SparkSession,
    pack: DictPack,
    n_conv: int = 200,
    turns_per_conv: int = 8,
    second_mention_p: float = 0.25,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript generation (with gold mentions).

    Every per-turn decision derives from splitmix64(turn_id), so output is
    byte-identical regardless of partitioning — the invariant tests and the
    two-parallelism bench depend on this.
    """
    n_rows = n_conv * turns_per_conv
    seed = pack.seed
    cdf = pack.zipf_cdf
    alias_choices = pack.alias_choices
    topic_words = pack.topic_words
    base_epoch = 1_735_689_600  # 2025-01-01T00:00:00Z — fixed, not now()

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            n = len(ids)
            conv = ids // turns_per_conv
            turn = (ids % turns_per_conv).astype(np.int32)
            uids = ids.astype(np.uint64)

            u_role = u01(uids, 1, seed)
            u_ent1 = u01(uids, 2, seed)
            u_alias1 = u01(uids, 3, seed)
            u_top = u01(uids, 4, seed)
            u_fill = u01(uids, 5, seed)
            u_second = u01(uids, 6, seed)
            u_ent2 = u01(uids, 7, seed)
            u_alias2 = u01(uids, 8, seed)

            e1 = np.searchsorted(cdf, u_ent1, side="right")
            e2 = np.searchsorted(cdf, u_ent2, side="right")

            texts, mention_lists, roles, tools = [], [], [], []
            for i in range(n):
                ent = int(e1[i])
                choices = alias_choices[ent]
                ua = u_alias1[i]
                alias = next(a for a, c in choices if ua <= c + 1e-12)
                tws = topic_words[ent]
                t1 = tws[int(u_top[i] * 6) % 6]
                t2 = tws[int(u_top[i] * 36) % 6]
                f1 = FILLERS[int(u_fill[i] * len(FILLERS)) % len(FILLERS)]
                f2 = FILLERS[int(u_fill[i] * 991) % len(FILLERS)]
                parts = [f1, f2, t1]
                mstart = len(parts)  # 0-based token index of first mention token
                parts += alias.split() + [t2]
                mentions = [(0, alias, ent, mstart + 1)]  # 1-based like spans
                if u_second[i] < second_mention_p:
                    ent_b = int(e2[i])
                    choices_b = alias_choices[ent_b]
                    ub = u_alias2[i]
                    alias_b = next(a for a, c in choices_b if ub <= c + 1e-12)
                    twsb = topic_words[ent_b]
                    t3 = twsb[int(u_top[i] * 216) % 6]
                    parts += ["and", t3] + alias_b.split()
                    mstart_b = len(parts) - len(alias_b.split())
                    mentions.append((1, alias_b, ent_b, mstart_b + 1))
                texts.append(" ".join(parts))
                mention_lists.append(
                    [
                        {
                            "mention_idx": int(mi),
                            "alias": a,
                            "entity_id": int(e),
                            "token_start": int(ts_),
                        }
                        for mi, a, e, ts_ in mentions
                    ]
                )
                if u_role[i] < 0.1:
                    roles.append("tool")
                    tools.append(TOOLS[int(u_role[i] * 1000) % len(TOOLS)])
                else:
                    roles.append("user" if turn[i] % 2 == 0 else "assistant")
                    tools.append("")

            out = pd.DataFrame(
                {
                    "conv_id": [f"c{c:08d}" for c in conv],
                    "turn_idx": turn,
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": pd.to_datetime(
                        base_epoch + conv * 3600 + turn * 30, unit="s"
                    ),
                    "mentions": mention_lists,
                }
            )
            yield out

    if num_partitions is None:
        # enough splits to keep every core busy, bounded by ~25k rows/task
        num_partitions = max(
            spark.sparkContext.defaultParallelism * 2, n_rows // 25_000 + 1
        )
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def transcripts(df_with_gold: DataFrame) -> DataFrame:
    """The public input table shape (BASELINE input_hint)."""
    return df_with_gold.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def gold_mentions(df_with_gold: DataFrame) -> DataFrame:
    """Ground-truth mention table for evaluation."""
    m = df_with_gold.select(
        "conv_id", "turn_idx", F.explode("mentions").alias("m")
    )
    return m.select(
        "conv_id",
        "turn_idx",
        F.col("m.mention_idx").alias("mention_idx"),
        F.col("m.alias").alias("alias"),
        F.col("m.entity_id").alias("entity_id"),
        F.col("m.token_start").alias("token_start"),
        F.concat_ws(
            "#", "conv_id", F.col("turn_idx").cast("string"), F.col("m.token_start").cast("string")
        ).alias("mention_id"),
    )


def alias_dict_df(spark: SparkSession, pack: DictPack) -> DataFrame:
    df = spark.createDataFrame(
        pack.alias_rows[
            [
                "alias",
                "QAF",
                "QAT",
                "QAC",
                "LAF",
                "LAT",
                "entity_id",
                "type",
                "QEF",
                "QAEF",
                "LET",
                "LAET",
            ]
        ]
    )
    return (
        df.withColumn("entity_id", F.col("entity_id").cast("int"))
        .withColumn("type", F.col("type").cast("smallint"))
    )


def entities_df(spark: SparkSession, pack: DictPack) -> DataFrame:
    return spark.createDataFrame(
        pack.entities[["entity_id", "name", "type"]]
    ).withColumn("entity_id", F.col("entity_id").cast("int"))


def embeddings_df(spark: SparkSession, pack: DictPack) -> DataFrame:
    return spark.createDataFrame(pack.embeddings).select(
        "key", F.col("vec").cast("array<smallint>").alias("vec")
    )
