"""Shipped model weight tables (fel_spark/models): the corpus plan's
default language-ID/quality scorers."""

from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.models import (
    LANGID_WEIGHTS,
    default_langid_model,
    default_quality_model,
    langid_weights_df,
)
from fel_spark.operators.textstats import language_id, quality_model_score


def test_langid_weights_are_dyadic_ascii():
    """Every weight must be dyadic-rational (bit-exact sums across engines)
    and every token ASCII-lowercase (survives normalize_tokens)."""
    for lang, tw in LANGID_WEIGHTS.items():
        for tok, w in tw.items():
            assert tok == tok.lower() and tok.isascii() and tok.isalnum(), (lang, tok)
            assert (w * 4) == int(w * 4), (lang, tok, w)  # multiple of 1/4


def test_shipped_langid_labels_five_languages(spark):
    bc = spark.sparkContext.broadcast(default_langid_model())
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "der hund und die katze sind nicht im haus"),
            (3, "le chien est dans la maison avec les enfants"),
            (4, "el perro y la casa de los vecinos para todos"),
            (5, "il cane di casa non sono mai contenti anche se"),
            (6, "zxqv wvut kjhg"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", language_id("text", bc_model=bc).alias("lang")
        ).collect()
    }
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "it", 6: "other"}


def test_shipped_quality_separates_prose_from_spam(spark):
    bc = spark.sparkContext.broadcast(default_quality_model())
    docs = spark.createDataFrame(
        [
            (1, "the analysis of the research data and published results"),
            (2, "click here buy cheap discount offer subscribe free win prize"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_model_score("text", bc_model=bc).alias("q")
        ).collect()
    }
    assert out[1] > 0.5 > out[2]


def test_weights_df_roundtrip(spark):
    df = langid_weights_df(spark)
    n = sum(len(tw) for tw in LANGID_WEIGHTS.values())
    assert df.count() == n
    assert df.filter(F.col("weight") == 0).count() == 0


def test_corpus_plan_defaults_to_shipped_model(spark, tmp_path):
    """run_corpus_prep without filter_kwargs must score language with the
    shipped table: an evident-German doc is dropped by the en-only filter
    even though the stopword HEURISTIC would keep anything ('der die und'
    are not English stopwords, so the heuristic would say 'other' too —
    use a doc the heuristic mislabels: English stopword lookalikes)."""
    from fel_spark.plans.corpus import run_corpus_prep

    # single varied sentences: repetition would trip the Gopher top-word /
    # dup-bigram filters and mask the language decision under test
    en = (
        "the data and analysis of a broad study in this report were "
        "described with care because results from recent research can be "
        "significant for everyone involved today"
    )
    de = (
        "der hund und die katze sind nicht in dem haus bei einem zug aber "
        "sie waren auch nach der langen nacht noch immer ganz ruhig da"
    )
    docs = spark.createDataFrame(
        [(1, en), (2, de)], ["doc_id", "text"]
    )
    out = run_corpus_prep(spark, str(tmp_path / "run"), docs)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {1}  # 'in' alone must not make the German doc English


def test_trained_tables_beat_heuristic_on_heldout():
    """The shipped TRAINED tables (logistic reduction, dyadic-quantized)
    must beat the no-model heuristics on a fresh held-out corpus (seed
    disjoint from training), evaluated with the DEPLOYED semantics
    (hit-gated argmax / mean-pooled linear score)."""
    from fel_spark.models import (
        TRAINED_LANGID_WEIGHTS,
        TRAINED_QUALITY_BIAS,
        TRAINED_QUALITY_WEIGHTS,
    )
    from scripts.train_langmodels import (
        TRAIN_SEED,
        heuristic_langid,
        heuristic_quality,
        make_langid_corpus,
        make_quality_corpus,
        predict_langid,
        predict_quality,
    )

    docs, labels = make_langid_corpus(TRAIN_SEED + 777, 120)
    pred = predict_langid(TRAINED_LANGID_WEIGHTS, docs)
    acc = sum(p == t for p, t in zip(pred, labels)) / len(labels)
    heur = heuristic_langid(docs)
    acc_h = sum(p == t for p, t in zip(heur, labels)) / len(labels)
    assert acc >= 0.98, acc
    assert acc > acc_h + 0.5, (acc, acc_h)  # heuristic is en/other only

    qdocs, qlabels = make_quality_corpus(TRAIN_SEED + 778, 150)
    sc = predict_quality(TRAINED_QUALITY_WEIGHTS, TRAINED_QUALITY_BIAS, qdocs)
    qacc = sum((s > 0) == bool(t) for s, t in zip(sc, qlabels)) / len(qlabels)
    hs = heuristic_quality(qdocs)
    hacc = sum((s > 0) == bool(t) for s, t in zip(hs, qlabels)) / len(qlabels)
    assert qacc >= 0.97, qacc
    assert qacc > hacc + 0.1, (qacc, hacc)


def test_trained_tables_are_dyadic():
    """Oracle digests rely on bit-exact cross-engine sums: every trained
    weight (and the bias) must be a multiple of 1/256."""
    from fel_spark.models import (
        TRAINED_LANGID_WEIGHTS,
        TRAINED_QUALITY_BIAS,
        TRAINED_QUALITY_WEIGHTS,
    )

    for tw in TRAINED_LANGID_WEIGHTS.values():
        for w in tw.values():
            assert (w * 256) == int(w * 256)
    for w in TRAINED_QUALITY_WEIGHTS.values():
        assert (w * 256) == int(w * 256)
    assert TRAINED_QUALITY_BIAS * 256 == int(TRAINED_QUALITY_BIAS * 256)


def test_default_models_load_trained_tables():
    from fel_spark.models import TRAINED_LANGID_WEIGHTS, default_langid_model

    m = default_langid_model()
    assert sorted(TRAINED_LANGID_WEIGHTS) == m.langs
    # spot: a trained weight landed in the matrix
    tok = next(iter(TRAINED_LANGID_WEIGHTS["en"]))
    j = m.token_index.get_loc(tok)
    assert m.weights[j, m.langs.index("en")] == TRAINED_LANGID_WEIGHTS["en"][tok]
