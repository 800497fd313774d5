"""Text analytics + multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fel_spark.operators import textstats
from fel_spark.sources import multimodal


def test_doc_stats_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "!!! ??? ..."),
            (3, "a"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textstats.doc_stats(docs).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[1]["lang_pred"] == "en"
    assert out[1]["quality"] > 0.8
    assert out[2]["n_tokens"] == 0
    assert out[2]["punct_ratio"] > 0.5
    assert out[3]["quality"] < 0.5


def test_language_id_model_hook(spark):
    """Pluggable model path: a broadcast token->lang-weight table overrides
    the heuristic; docs with no vocab hits fall back to default_lang."""
    model = textstats.LangIdModel(
        {
            "en": {"the": 1.0, "dog": 0.5, "cat": 0.5},
            "de": {"der": 1.0, "hund": 0.8, "katze": 0.8},
            "fr": {"le": 1.0, "chien": 0.8},
        }
    )
    bc = spark.sparkContext.broadcast(model)
    docs = spark.createDataFrame(
        [
            (1, "the dog chases the cat"),
            (2, "der Hund jagt die Katze"),
            (3, "le chien dort"),
            (4, "zzz qqq www"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", textstats.language_id("text", bc_model=bc).alias("lang")
        ).collect()
    }
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "other"
    assert out[5] == "other"
    # default heuristic path unchanged (oracle contract)
    heur = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", textstats.language_id("text").alias("lang")
        ).collect()
    }
    assert heur[1] == "en"


def test_language_id_negative_weights(spark):
    """The fallback gates on zero vocabulary HITS, not non-positive max:
    a fastText-style table with negative/zero weights must still label
    documents that hit the vocabulary (ADVICE r3)."""
    model = textstats.LangIdModel(
        {
            "en": {"the": -0.1, "dog": -0.5},
            "de": {"der": -0.2, "the": -0.9, "dog": -0.9},
        }
    )
    bc = spark.sparkContext.broadcast(model)
    docs = spark.createDataFrame(
        [(1, "the dog runs"), (2, "der zug"), (3, "zzz qqq")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", textstats.language_id("text", bc_model=bc).alias("lang")
        ).collect()
    }
    assert out[1] == "en"  # hit vocab, negative scores: argmax, no fallback
    assert out[2] == "de"
    assert out[3] == "other"  # genuinely zero hits


def test_rolling_fingerprints(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    fps = docs.select(
        textstats.rolling_fingerprints("text", window=5).alias("fps")
    ).collect()[0]["fps"]
    assert len(fps) == 2  # two 5-grams in 6 tokens
    assert len(set(fps)) == 2


def test_media_features_deterministic(spark):
    media = multimodal.synth_media(spark, 12)
    f1 = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feat"] for r in multimodal.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())


def test_media_decode_stub_raises(spark):
    media = multimodal.synth_media(spark, 3)
    with pytest.raises(Exception):
        multimodal.extract_features(media, fake=False).collect()


def test_frame_sampling_counts(spark):
    media = multimodal.synth_media(spark, 9)
    frames = multimodal.sample_frames(media, every_ms=500)
    vids = media.filter(F.col("kind") == "video").collect()
    want = sum(r["meta"]["duration_ms"] // 500 + 1 for r in vids)
    assert frames.count() == want


def test_repetition_signals(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),  # a x3; bigrams: [a b, b a, a b, b a] -> 4 total / 2 distinct
            (2, "x"),
            (3, "!!!"),  # normalizes to zero tokens
            (4, "u v w x"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textstats.repetition_signals(docs).collect()}
    assert (out[1]["n_words"], out[1]["top_word_c"]) == (5, 3)
    assert out[1]["top_word_4dp"] == 6000
    assert out[1]["dup_bigram_4dp"] == 5000
    assert (out[2]["n_words"], out[2]["top_word_c"], out[2]["dup_bigram_4dp"]) == (1, 1, 0)
    assert (out[3]["n_words"], out[3]["top_word_c"]) == (0, 0)
    assert (out[4]["top_word_4dp"], out[4]["dup_bigram_4dp"]) == (2500, 0)


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.co or +1-555-0042 now"), (2, "clean text")],
        ["doc_id", "text"],
    )
    n_e, n_p = textstats.pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            textstats.scrub_pii("text").alias("s"),
            n_e.alias("e"),
            n_p.alias("p"),
        ).collect()
    }
    assert out[1]["s"] == "mail <EMAIL> or <PHONE> now"
    assert (out[1]["e"], out[1]["p"]) == (1, 1)
    assert out[2]["s"] == "clean text" and (out[2]["e"], out[2]["p"]) == (0, 0)


def test_quality_model_hook(spark):
    """Pluggable quality model: fastText-style mean token weight + bias ->
    sigmoid; OOV tokens count in the denominator; no model -> heuristic."""
    import math

    model = textstats.QualityModel(
        {"good": 1.0, "great": 2.0, "spam": -4.0}, bias=0.5
    )
    bc = spark.sparkContext.broadcast(model)
    docs = spark.createDataFrame(
        [
            (1, "good great"),          # z = 0.5 + (1+2)/2 = 2.0
            (2, "spam spam spam spam"), # z = 0.5 - 4 = -3.5
            (3, "zzz qqq"),             # all OOV: z = bias = 0.5
            (4, ""),                    # no tokens: z = bias
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id",
            textstats.quality_model_score("text", bc_model=bc).alias("q"),
        ).collect()
    }
    sig = lambda z: 1.0 / (1.0 + math.exp(-z))
    assert abs(out[1] - sig(2.0)) < 1e-12
    assert abs(out[2] - sig(-3.5)) < 1e-12
    assert abs(out[3] - sig(0.5)) < 1e-12
    assert abs(out[4] - sig(0.5)) < 1e-12

    # no model supplied -> falls back to the quality_score heuristic
    heur = docs.select(
        textstats.quality_model_score("text").alias("q"),
        textstats.quality_score("text").alias("h"),
    ).collect()
    assert all(abs(r["q"] - r["h"]) < 1e-12 for r in heur)


def test_word_bigrams_null_parity(spark):
    """NULL token array -> NULL bigrams (not []) so the dup_bigram digest
    stays NULL for NULL text, matching the DuckDB oracle replay."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "b"]), (2, None), (3, [])],
        "i int, toks array<string>",
    )
    rows = {
        r["i"]: (r["bg"], r["d4"])
        for r in df.select(
            "i",
            textstats.word_bigrams(F.col("toks")).alias("bg"),
            textstats.dup_bigram_4dp_expr(F.col("toks")).alias("d4"),
        ).collect()
    }
    assert rows[1] == (["a b", "b a", "a b"], 3333)
    assert rows[2] == (None, None)
    assert rows[3] == ([], 0)


def test_rolling_fingerprints_tokens_column(spark):
    """The materialized-tokens fast path must equal the default
    normalize_tokens path."""
    from pyspark.sql import functions as F

    from fel_spark.functions.text import normalize_tokens

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x"), (3, "")], ["doc_id", "text"]
    )
    base = docs.withColumn("_t", normalize_tokens("text"))
    via_col = base.select(
        "doc_id",
        textstats.rolling_fingerprints(window=5, tokens=F.col("_t")).alias("fps"),
    )
    via_text = docs.select(
        "doc_id", textstats.rolling_fingerprints("text", window=5).alias("fps")
    )
    a = {r["doc_id"]: r["fps"] for r in via_col.collect()}
    b = {r["doc_id"]: r["fps"] for r in via_text.collect()}
    assert a == b and len(a[1]) == 2 and a[2] == [] and a[3] == []


# ---------------------------------------------------------------------------
# extended PII scrub (r5): Luhn-gated card redaction, IPv4 lookarounds


def test_luhn_valid_column_matches_reference(spark):
    import random

    from fel_spark.operators.textstats import luhn_valid

    def ref(s):
        d = [int(x) for x in s][::-1]
        t = sum(d[0::2]) + sum((2 * x - 9) if 2 * x > 9 else 2 * x for x in d[1::2])
        return t % 10 == 0

    rng = random.Random(7)
    nums = ["4111111111111111", "4111111111111112", "378282246310005"]
    nums += ["".join(rng.choice("0123456789") for _ in range(rng.randint(13, 16)))
             for _ in range(60)]
    df = spark.createDataFrame([(n,) for n in nums], "n string")
    got = {r.n: r.ok for r in df.select("n", luhn_valid("n").alias("ok")).collect()}
    for n in nums:
        assert got[n] == ref(n), n


def test_scrub_pii_extended_rules(spark):
    from fel_spark.operators.textstats import scrub_pii_extended

    rows = [
        ("a", "pay 4111111111111111 or 4532015112830366 now"),
        ("b", "order 4111111111111112 is not a card"),
        ("c", "host 10.0.0.1 edge 255.255.255.255 non-ip 999.1.1.1 run 1.2.3.4.5"),
        ("d", "mail bob@x.io card 378282246310005 ip 8.8.8.8"),
        ("e", "plain 1234 text"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r.s for r in
           df.select("doc_id", scrub_pii_extended("text").alias("s")).collect()}
    assert out["a"] == "pay <CC> or <CC> now"
    assert out["b"] == "order 4111111111111112 is not a card"  # checksum fails
    # lookarounds: 999.x never matches; the 5-octet run is left whole
    assert out["c"] == "host <IP> edge <IP> non-ip 999.1.1.1 run 1.2.3.4.5"
    assert out["d"] == "mail <EMAIL> card <CC> ip <IP>"
    assert out["e"] == "plain 1234 text"


def test_scrub_pii_extended_plan_is_udf_free(spark):
    from fel_spark.operators.textstats import scrub_pii_extended

    df = spark.createDataFrame([("x", "t 4111111111111111")],
                               "doc_id string, text string")
    plan = df.select(scrub_pii_extended("text"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
