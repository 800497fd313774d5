"""Physical-plan assertions: the plans we designed are the plans we get.

- filters/projections reach the parquet scan (PushedFilters / ReadSchema)
- dictionary joins are broadcast hash joins, not shuffles
- the pairwise self-join is a shuffle join on block_key (SMJ or AQE-chosen)
- ranking is pure column arithmetic (no Python eval in the phase-1 plan)
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_to_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,45" in plan
    # column pruning: only the two selected columns in ReadSchema
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_dict_join_is_broadcast(spark, dict_pack):
    from fel_spark.operators.mentions import (
        candidate_mentions,
        enumerate_spans,
        prepare_candidate_dict,
    )
    from fel_spark.sources.synth import alias_dict_df, entities_df, synth_transcripts_df, transcripts

    t = transcripts(synth_transcripts_df(spark, dict_pack, n_conv=10, turns_per_conv=3))
    cd = prepare_candidate_dict(
        alias_dict_df(spark, dict_pack), entities_df(spark, dict_pack)
    )
    cands = candidate_mentions(enumerate_spans(t), cd)
    plan = _plan(cands)
    assert "BroadcastHashJoin" in plan
    # the big side must NOT be exchanged for this join
    assert "SortMergeJoin" not in plan


def test_pair_join_shuffles_on_block_key(spark):
    from fel_spark.operators import blocking

    m = spark.createDataFrame(
        [("m1", "alpha beta", 1, "_k", 0.0), ("m2", "alpha beta", 1, "_k", 0.0)],
        ["mention_id", "span", "entity_id", "entity_key", "score"],
    )
    blocked = blocking.blocking_keys(m)
    pairs = blocking.candidate_pairs(blocked)
    plan = _plan(pairs)
    assert "block_key" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "Exchange hashpartitioning(block_key" in plan
    )


def test_phase1_ranking_has_no_python_eval(spark, dict_pack):
    from fel_spark.operators.mentions import prepare_candidate_dict
    from fel_spark.sources.synth import alias_dict_df, entities_df

    cd = prepare_candidate_dict(
        alias_dict_df(spark, dict_pack), entities_df(spark, dict_pack)
    )
    plan = _plan(cd)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_whole_stage_codegen_on_scan_agg(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    q.collect()  # AQE finalizes the physical plan on execution
    # "*(n)" prefixes mark WholeStageCodegen spans in the simple plan string
    assert "*(" in _plan(q)


def test_minhash_signature_agg_is_partial(spark):
    """The explode+min-agg MinHash signature must map-side combine: the
    shuffle carries num_hashes longs per key, not one row per gram."""
    from fel_spark.functions.hashing import minhash_signatures_df

    docs = spark.createDataFrame(
        [(1, ["a b c", "b c d"]), (2, ["x y z"])], ["doc_id", "grams"]
    )
    sig = minhash_signatures_df(docs, F.col("grams"), ["doc_id"], 4)
    plan = _plan(sig)
    # partial_min before the exchange = map-side combine
    assert "partial_min" in plan or "partial min" in plan, plan
    assert "Exchange" in plan


def test_intent_part_is_pure_column_math(spark):
    """P7 must stay inside codegen: no Python eval, no shuffle."""
    from fel_spark.functions.text import intent_part, normalize_fast

    df = spark.createDataFrame([("brad pitt movies",)], ["q"])
    out = df.select(
        intent_part(
            normalize_fast("q"), F.lit("Brad_Pitt%3A%28actor%29")
        ).alias("intent")
    )
    plan = _plan(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert out.collect()[0]["intent"].strip() == "movies"


def test_minhash_near_dup_bands_ids_only(spark):
    """The banded/persisted working set must carry ONLY (doc_id, block_key):
    the normalized text attaches by id-join after pair dedup. Guard: no
    InMemoryTableScan (the persist) may materialize the `tn` column."""
    import __spark_entry__ as E

    df = E.queries()["minhash_near_dup"](spark, SF)
    plan = _plan(df)
    cached = [
        ln for ln in plan.splitlines() if "InMemoryTableScan" in ln
    ]
    assert cached, "expected the banded ids (and the tn projection) cached"
    banded = [ln for ln in cached if "block_key" in ln]
    assert banded, "banded working set should be cached"
    for ln in banded:
        # column refs print as `tn#<exprId>`; a bare "tn" would also match
        # inside isnotnull(...)
        assert "tn#" not in ln, f"text payload riding the band cache: {ln}"


def test_bigram_dice_pairs_single_join_no_udf(spark):
    """The dice query is one equi-join + pure column math: no cartesian
    product, no Python/pandas eval in the plan."""
    import __spark_entry__ as E

    df = E.queries()["bigram_dice_pairs"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ann_lsh_md5_bucket_join_not_cartesian(spark):
    """The value-checked LSH twin must candidate via the band-key equi-join
    (bucket collisions), never an all-pairs cross join."""
    import __spark_entry__ as E

    df = E.queries()["ann_lsh_md5"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "bk" in plan  # the band-key join key is in the plan


def test_repetition_signals_map_only(spark):
    """Gopher repetition signals are row-local HOFs: the plan must have NO
    exchange — one scan at any corpus size."""
    from fel_spark.operators.textstats import repetition_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(repetition_signals(docs))
    assert "Exchange" not in plan, plan


def test_session_stats_single_exchange(spark):
    """The per-session rollup's groupBy key (user_id, session_seq) extends
    the window's partition key (user_id), so HashPartitioning(user_id)
    satisfies the aggregation's clustering — exactly one exchange total."""
    from fel_spark.operators.sessions import session_stats

    e = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(session_stats(e))
    n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_ex == 1, plan


def test_bucketed_join_elides_both_exchanges(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count must
    sort-merge join with NO Exchange on either side — the amortize-the-
    shuffle-into-the-write contract of sources/bucketed.py."""
    from fel_spark.sources.bucketed import read_bucketed, write_bucketed

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bkt_test LOCATION '{tmp_path}/bkt'"
    )
    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        left = docs.select("doc_id", "source").repartition(4, "doc_id")
        right = (
            docs.select("doc_id", "n_chars").repartition(4, "doc_id")
        )
        write_bucketed(left, "bkt_test.t1", "doc_id", 4, sort_cols=("doc_id",))
        write_bucketed(right, "bkt_test.t2", "doc_id", 4, sort_cols=("doc_id",))
        # pin the sort-merge regime: at production scale neither side
        # broadcasts, which is exactly when bucketing pays; with the tiny
        # fixture Spark would broadcast and (correctly) skip the bucketed
        # scan entirely
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_bucketed(spark, "bkt_test.t1").join(
                read_bucketed(spark, "bkt_test.t2"), "doc_id"
            )
            plan = _plan(j)
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan
            # and the join result is correct
            assert j.count() == docs.count()
            # a non-bucketed copy of the same join DOES shuffle — the
            # baseline proving the elision came from the bucket spec
            nb = docs.select("doc_id", "source").join(
                docs.select("doc_id", "n_chars"), "doc_id"
            )
            assert "Exchange" in _plan(nb)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt_test CASCADE")


def test_media_phash_pairs_no_cartesian(spark):
    """The banded-Hamming kernel must plan as a block-key equi-join (same
    salt-capped shape as SimHash), never a cartesian product; the Hamming
    verify must stay JVM-side (bit_count, no Python eval)."""
    from fel_spark.sources.multimodal import image_phash_pairs, synth_patterned_images

    pairs = image_phash_pairs(synth_patterned_images(spark, 4), max_hamming=6)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # only the fingerprint UDF is Python


def test_warc_parse_plan_is_map_only(spark):
    """WARC bytes -> documents is parse + extract with NO shuffle: at
    crawl scale every Exchange here would move the whole corpus."""
    from fel_spark.sources.warc import (
        read_warc_bytes, synth_warc_bytes_range, warc_documents,
    )

    mem = spark.createDataFrame(
        [(bytearray(synth_warc_bytes_range(0, 3)),)], "content binary"
    )
    plan = warc_documents(read_warc_bytes(mem))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_webdataset_samples_plan_has_one_exchange(spark):
    """Member rows -> per-sample pivot is ONE hash aggregate keyed by
    (shard, key): exactly one Exchange, no join, no second shuffle."""
    from fel_spark.sources.webdataset import (
        read_webdataset_bytes, samples, synth_webdataset_bytes,
    )

    mem = spark.createDataFrame(
        [("s.tar", bytearray(synth_webdataset_bytes(0, 2)))],
        "path string, content binary",
    )
    plan = samples(read_webdataset_bytes(mem), exts=("png", "txt")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_fs_pipeline_plans_no_cartesian_no_python(spark):
    """Fellegi-Sunter estimation/scoring and blocking-quality are pure
    DataFrame algebra: blocked equi-joins only (never cartesian), no
    Python/pandas eval anywhere, and the melt is an explode (map-side,
    no extra Exchange for the feature fan-out)."""
    import __spark_entry__ as E

    for q in ("er_fs_weights", "er_fs_scores", "er_blocking_quality"):
        plan = _plan(E.queries()[q](spark, SF))
        assert "CartesianProduct" not in plan, q
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_golden_records_plan_cluster_keyed(spark):
    """Survivorship: no cartesian, no Python eval; the explode melt is
    map-side (Generate node present, not an Exchange producer)."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["er_golden_records"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_snm_pairs_plan_broadcast_offsets_no_cartesian(spark):
    """SNM: the rank-offset table joins back via BROADCAST (never a
    corpus shuffle), the band self-join is an equi-join (no cartesian),
    and nothing drops to Python eval."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["er_snm_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_blocksplit_plan_broadcast_sizes_no_cartesian(spark):
    """BlockSplit: the hot-size annotation joins via BROADCAST (the hot
    table is distinct hot keys, dictionary-scale by construction), the
    task self-join is an equi-join on _task (no cartesian), and the
    whole chain stays JVM-side."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["er_blocksplit_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_pprl_encode_plan_map_only_no_udf(spark):
    """PPRL Bloom encoding is pure column algebra: no Exchange (map-only
    over the input) and no Python eval — the k hashed positions, the
    distinct-union and the sort all stay in codegen."""
    from fel_spark.operators.pprl import bloom_encode

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(bloom_encode(docs, "text", "doc_id"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_numeric_date_scores_plan_map_only(spark):
    """Numeric/temporal comparators add zero shuffles past the blocked
    join: applied to a pre-joined pair set, the plan has no Exchange and
    no Python eval."""
    from fel_spark.operators.editsim import numeric_date_scores

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pairs = ev.select(
        F.col("event_id").alias("id_a"),
        F.col("value").alias("v_a"),
        F.col("ts").alias("ts_a"),
        (F.col("event_id") + 1).alias("id_b"),
        F.col("value").alias("v_b"),
        F.col("ts").alias("ts_b"),
    )
    plan = _plan(numeric_date_scores(pairs, "v_a", "v_b", "ts_a", "ts_b"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_collective_evidence_plan_no_cartesian_no_python(spark):
    """Collective-ER evidence rounds are equi-joins + hash aggregates —
    never a cartesian, never Python eval."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["er_collective"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_qgram_join_plan_equi_join_no_cartesian(spark):
    """q-gram edit join: the inverted-index join is an equi-join on the
    gram (never a cartesian) and the whole chain — explode, filters,
    count aggregate, levenshtein verify — stays JVM-side."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["er_qgram_join"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
