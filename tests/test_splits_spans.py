"""Dataset splitting + span-level dedup (scale path: xxhash64 defaults).

The md5 oracle variants are value-checked by the driver gate
(doc_hash_split / doc_span_dup / doc_span_coverage); these tests pin the
xxhash64 scale path's semantics: determinism under repartitioning,
realized fractions, map-only plan, and exact span accounting on a corpus
with known duplicated windows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fel_spark.operators.dedup import duplicated_spans, span_coverage
from fel_spark.operators.splits import hash_split, split_counts


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(17, "doc_id")).collect()
    }
    assert a == b
    counts = {r["split"]: r["n"] for r in split_counts(hash_split(df)).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 5000
    # realized fractions within ~2 sigma of 0.90/0.05/0.05 on 5000 ids
    assert abs(counts["train"] / 5000 - 0.90) < 0.02
    assert abs(counts["val"] / 5000 - 0.05) < 0.02


def test_hash_split_is_map_only(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, weights=(("train", 0.5), ("test", 0.4)))


def _span_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"{shared} one two three"),
        (2, f"zero {shared} four five"),
        (3, "totally different words with no repeated window here ok"),
        (4, "short doc"),  # < 8 tokens: contributes no spans
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicated_spans_exact(spark):
    d = _span_docs(spark)
    hot = duplicated_spans(d, window=8, min_docs=2).collect()
    # exactly ONE 8-token window is shared verbatim between docs 1 and 2
    assert len(hot) == 1
    assert hot[0]["n_docs"] == 2 and hot[0]["n_occurrences"] == 2


def test_span_coverage_exact(spark):
    d = _span_docs(spark)
    cov = {r["doc_id"]: r for r in span_coverage(d, window=8, min_docs=2).collect()}
    # docs 1 and 2: 11 tokens -> 4 windows each, 1 duplicated (the shared
    # 8-token run); doc 3: 9 tokens -> 2 windows, 0 duplicated
    assert set(cov) == {1, 2, 3}  # doc 4 has no windows
    assert (cov[1]["n_spans"], cov[1]["n_dup_spans"]) == (4, 1)
    assert (cov[2]["n_spans"], cov[2]["n_dup_spans"]) == (4, 1)
    assert (cov[3]["n_spans"], cov[3]["n_dup_spans"]) == (2, 0)
    assert cov[1]["dup_coverage"] == pytest.approx(0.25)


def test_span_ops_single_scan_no_pair_explosion(spark):
    """duplicated_spans is explode + ONE hash aggregate — no join in the
    plan (the scale contract: linear in token count, never pairs)."""
    d = _span_docs(spark)
    plan = (
        duplicated_spans(d, window=8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_stratified_sample_deterministic_and_exact_strata(spark):
    from fel_spark.operators.splits import stratified_sample

    df = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(4000)], ["doc_id", "source"]
    )
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = stratified_sample(df, rates, default_rate=0.25)
    rows = kept.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # rate 1.0 keeps everything, 0.0 keeps nothing; fractional rates land
    # near target on 1000 ids per stratum
    assert len(by_src.get("src0", ())) == 1000
    assert "src2" not in by_src
    assert abs(len(by_src["src1"]) / 1000 - 0.5) < 0.05
    assert abs(len(by_src["src3"]) / 1000 - 0.25) < 0.05
    # partition-invariant: same kept set after a repartition
    again = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), rates, default_rate=0.25).collect()
    }
    assert again == {r["doc_id"] for r in rows}


def test_corpus_filter_rules(spark):
    from fel_spark.operators.filtering import (
        corpus_filter_decisions,
        filter_audit,
        filter_corpus,
    )

    good = (
        "the quick brown fox jumps over a lazy dog and then walks to town "
        "for supper while night falls on quiet streets of old houses near "
        "the river bank"
    )
    rows = [
        (1, good),                                   # passes everything
        (2, "too short"),                            # f_short
        (3, "spam " * 120),                          # f_top_word (+low stopword)
        (4, ("x7 k9 q2 " * 10)),                     # f_low_stopword + f_lang
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    dec = {r["doc_id"]: r for r in corpus_filter_decisions(d).collect()}
    assert dec[1]["keep"] and sum(
        dec[1][f] for f in ("f_short", "f_long", "f_top_word", "f_dup_bigram",
                            "f_low_stopword", "f_lang")
    ) == 0
    assert dec[2]["f_short"] == 1 and not dec[2]["keep"]
    assert dec[3]["f_top_word"] == 1 and not dec[3]["keep"]
    assert dec[4]["f_low_stopword"] == 1 and dec[4]["f_lang"] == 1

    kept = filter_corpus(d)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    audit = filter_audit(corpus_filter_decisions(d)).collect()[0]
    assert audit["n_docs"] == 4 and audit["n_kept"] == 1


def test_corpus_filter_is_map_only(spark):
    from fel_spark.operators.filtering import corpus_filter_decisions

    d = spark.createDataFrame([(1, "a few words here")], ["doc_id", "text"])
    plan = (
        corpus_filter_decisions(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pack_sequences_exact_offsets(spark):
    from fel_spark.operators.packing import pack_sequences, packing_stats

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, ""), (4, "h i")], ["doc_id", "text"]
    )
    packed = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=4, n_shards=1).collect()
    }
    assert set(packed) == {1, 2, 4}  # empty doc dropped
    assert (packed[1]["start_offset"], packed[1]["start_chunk"], packed[1]["end_chunk"]) == (0, 0, 0)
    # doc 2 occupies stream positions 3..6: crosses the budget-4 boundary
    assert (packed[2]["start_offset"], packed[2]["start_chunk"], packed[2]["end_chunk"]) == (3, 0, 1)
    assert (packed[4]["start_offset"], packed[4]["start_chunk"], packed[4]["end_chunk"]) == (7, 1, 2)
    stats = packing_stats(pack_sequences(docs, budget=4, n_shards=1), budget=4).collect()[0]
    assert stats["total_tokens"] == 9 and stats["n_chunks"] == 3


def test_pack_sequences_shards_partition_invariant(spark):
    from fel_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(200)], ["doc_id", "text"]
    )
    a = {r["doc_id"]: (r["shard"], r["start_offset"]) for r in pack_sequences(docs, budget=16, n_shards=4).collect()}
    b = {
        r["doc_id"]: (r["shard"], r["start_offset"])
        for r in pack_sequences(docs.repartition(11), budget=16, n_shards=4).collect()
    }
    assert a == b


def test_excise_duplicated_spans_all_but_one(spark):
    from fel_spark.operators.dedup import excise_duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    d = spark.createDataFrame(
        [
            (1, f"{shared} tail one"),
            (2, f"{shared} tail two"),
            (3, "completely different words that no other document shares"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in excise_duplicated_spans(d, window=8).collect()}
    # doc 1 holds the winner occurrence (min packed key) and keeps its text;
    # doc 2's copy of the shared window is cut, its unique tail survives
    assert out[1]["text_clean"] == f"{shared} tail one" and out[1]["n_cut"] == 0
    assert out[2]["text_clean"] == "two" and out[2]["n_cut"] == 9
    assert out[3]["n_cut"] == 0 and out[3]["text_clean"].startswith("completely")


def test_excise_protects_winner_under_overlapping_repeats(spark):
    """A run of identical tokens makes one window's loser overlap another
    window's winner; winner-covered positions must survive so at least one
    intact copy of the duplicated window remains (Lee et al. all-but-one)."""
    from fel_spark.operators.dedup import excise_duplicated_spans

    d = spark.createDataFrame(
        [(1, "x " * 9), (2, "x " * 8)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in excise_duplicated_spans(d, window=8).collect()}
    # doc 1: winner occupies positions 0..7; its self-overlapping loser at
    # pos 1 may only cut position 8
    assert out[1]["text_clean"] == "x x x x x x x x" and out[1]["n_cut"] == 1
    assert out[2]["text_clean"] == "" and out[2]["n_cut"] == 8


def test_excise_works_with_string_ids(spark):
    from fel_spark.operators.dedup import excise_duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    d = spark.createDataFrame(
        [("doc-a", f"{shared} one"), ("doc-b", f"{shared} two")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in excise_duplicated_spans(d, window=8).collect()}
    # 'doc-a' < 'doc-b': doc-a wins, doc-b's copy is excised
    assert out["doc-a"]["n_cut"] == 0
    assert out["doc-b"]["text_clean"] == "two" and out["doc-b"]["n_cut"] == 8


def test_hash_split_rejects_zero_bucket_weight(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="rounds to zero"):
        hash_split(
            df,
            weights=(("train", 0.99995), ("test", 0.00005)),
        )


def test_pack_sequences_group_streams_do_not_mix(spark):
    from fel_spark.operators.packing import pack_sequences

    rows = [(i, "train" if i % 2 == 0 else "test", "w " * 5) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "split", "text"])
    packed = pack_sequences(docs, budget=8, n_shards=2, group_col="split").collect()
    # offsets restart per (split, shard) stream — each stream is an
    # independent token stream, so no chunk's token range ever spans two
    # splits (chunk identity is (split, chunk_id); consumers read per split)
    streams = {}
    for r in packed:
        streams.setdefault((r["split"], r["shard"]), []).append(
            (r["start_offset"], r["n_tokens"])
        )
    assert len(streams) == 4  # 2 splits x 2 shards, all non-empty
    for offs in streams.values():
        offs.sort()
        assert offs[0][0] == 0
        # contiguous: each doc starts exactly where the previous ended
        for (a, n), (b, _) in zip(offs, offs[1:]):
            assert b == a + n


def test_containment_catches_quote_inside_document(spark):
    """A short doc quoted verbatim inside a long one: tiny Jaccard, but
    containment 1.0 — the asymmetric case the symmetric dedups miss."""
    from fel_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    long_doc = (
        "many unrelated words come before the quoted passage begins here "
        f"{quote} and then the long document continues with plenty of "
        "additional unrelated material after the quotation ends entirely"
    )
    d = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "completely different text with no shared spans at all")],
        ["doc_id", "text"],
    )
    rows = containment_pairs(d, window=5, min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["cont_a4"] == 10000  # doc 1 fully contained
    assert r["cont_b4"] < 5000    # doc 2 is much bigger


# ---------------------------------------------------------------------------
# decontamination


def _decon_docs(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = spark.createDataFrame(
        [
            (1, f"intro words here {leak} trailing body text"),  # contaminated
            (2, "completely unrelated training document body with many words"),
            (3, "tiny doc"),  # < window tokens -> zero shingles, kept
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark question {leak} benchmark answer")],
        "doc_id long, text string",
    )
    return train, ev


def test_decontaminate_flags_leaked_ngram(spark):
    from fel_spark.operators.dedup import decontaminate

    train, ev = _decon_docs(spark)
    out = {r["doc_id"]: r.asDict() for r in decontaminate(train, ev, window=8).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["keep"] is False and out[1]["n_contaminated"] >= 1
    assert out[2]["keep"] is True and out[2]["n_contaminated"] == 0
    # zero-shingle doc keeps a row and is kept
    assert out[3]["n_spans"] == 0 and out[3]["keep"] is True


def test_decontaminate_max_overlap_tolerance(spark):
    from fel_spark.operators.dedup import decontaminate

    train, ev = _decon_docs(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(train, ev, window=8, max_overlap=0.9).collect()
    }
    # doc 1 has 1 leaked window out of several -> fraction < 0.9 -> kept
    assert out[1]["keep"] is True
    assert out[1]["cont_4dp"] > 0


def test_decontaminate_broadcasts_eval_side(spark):
    from fel_spark.operators.dedup import decontaminate

    train, ev = _decon_docs(spark)
    plan = (
        decontaminate(train, ev, window=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_decontamination_report_provenance(spark):
    from fel_spark.operators.dedup import decontamination_report

    train, ev = _decon_docs(spark)
    rows = {r["eval_id"]: r.asDict() for r in decontamination_report(
        train, ev, window=8
    ).collect()}
    # only eval doc 100 leaked; exactly one train doc shares its window
    assert set(rows) == {100}
    assert rows[100]["n_train_docs_hit"] == 1
    assert rows[100]["n_hit_spans"] >= 1


def test_decontaminate_eval_frame_with_different_columns(spark):
    from fel_spark.operators.dedup import decontaminate

    train, ev = _decon_docs(spark)
    ev2 = ev.selectExpr("doc_id as qid", "text as question")
    out = {
        r["doc_id"]: r["keep"]
        for r in decontaminate(
            train, ev2, window=8, eval_id_col="qid", eval_text_col="question"
        ).collect()
    }
    assert out[1] is False and out[2] is True and out[3] is True


def test_budget_sample_partition_invariant_and_prefix(spark):
    from fel_spark.operators.splits import budget_sample

    docs = spark.createDataFrame(
        [(i, "word " * (5 + i % 17)) for i in range(300)], ["doc_id", "text"]
    )
    a = budget_sample(docs, budget_tokens=900, seed=5)
    b = budget_sample(docs.repartition(17), budget_tokens=900, seed=5)
    rows_a = sorted((r.doc_id, r.cum_tokens) for r in a.collect())
    rows_b = sorted((r.doc_id, r.cum_tokens) for r in b.collect())
    assert rows_a == rows_b and 0 < len(rows_a) < 300
    # strict prefix in rank order: inclusive cumsum never exceeds budget,
    # and the kept set is exactly the head of the hash order
    ranked = sorted((r.sample_rank, r.doc_id, r.n_tokens) for r in a.collect())
    running = 0
    for rank, _id, n in ranked:
        running += n
        assert running <= 900
    # the next doc in global hash order must NOT fit
    all_ranked = sorted(
        (r.sample_rank, r.n_tokens)
        for r in budget_sample(docs, budget_tokens=10**9, seed=5).collect()
    )
    nxt = all_ranked[len(ranked)]
    assert running + nxt[1] > 900


def test_mixture_sample_per_domain_budgets(spark):
    import pyspark.sql.functions as F

    from fel_spark.operators.splits import mixture_sample

    docs = spark.createDataFrame(
        [(i, ["news", "code", "web"][i % 3], "tok " * (4 + i % 9)) for i in range(240)],
        ["doc_id", "domain", "text"],
    )
    out = mixture_sample(docs, budgets={"news": 300, "code": 150})
    rows = out.groupBy("domain").agg(
        F.max("cum_tokens").alias("mx"), F.count("*").alias("n")
    ).collect()
    got = {r.domain: r for r in rows}
    assert set(got) == {"news", "code"}          # unlisted domain dropped
    assert got["news"].mx <= 300 and got["code"].mx <= 150
    assert got["news"].n > 0 and got["code"].n > 0
    # partition invariance
    a = sorted((r.doc_id, r.cum_tokens) for r in out.collect())
    b = sorted(
        (r.doc_id, r.cum_tokens)
        for r in mixture_sample(
            docs.repartition(13), budgets={"news": 300, "code": 150}
        ).collect()
    )
    assert a == b
