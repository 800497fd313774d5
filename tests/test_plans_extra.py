"""Checkpointed resumable runs, dictionary build, coherence, streaming."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from fel_spark.operators.coherence import coherent_assignments
from fel_spark.plans import dictionary as D, metrics as MX
from fel_spark.operators.context import EmbeddingMatrix, broadcast_embeddings
from fel_spark.sources.synth import (
    alias_dict_df,
    embeddings_df,
    entities_df,
    gold_mentions,
    transcripts,
)


def test_stage_runner_resumes(spark, tmp_path):
    run_dir = str(tmp_path / "run1")
    calls = {"n": 0}

    def build(r):
        calls["n"] += 1
        return spark.range(10).withColumn("x", F.col("id") * 2)

    runner = MX.StageRunner(spark, run_dir)
    out1 = runner.run_stage("stage_a", build)
    assert out1.count() == 10
    assert calls["n"] == 1
    # second run: snapshot hit, builder NOT called
    runner2 = MX.StageRunner(spark, run_dir)
    out2 = runner2.run_stage("stage_a", build)
    assert out2.count() == 10
    assert calls["n"] == 1
    # per-partition lineage metrics written
    m = runner2.metrics_df()
    assert m.filter("stage = 'stage_a'").count() >= 1
    assert os.path.exists(os.path.join(run_dir, "stage_a", MX.MANIFEST))


def test_stage_runner_same_second_rebuild_invalidates(spark, tmp_path):
    """ADVICE r3: staleness is a generation (snapshot-id) comparison, not
    an mtime one — an input rebuilt in the same 1 s filesystem-timestamp
    window as the downstream snapshot must still invalidate it."""
    run_dir = str(tmp_path / "run_gen")
    calls = {"up": 0, "down": 0}

    def build_up(r):
        calls["up"] += 1
        return spark.range(5).withColumn("v", F.col("id") + calls["up"])

    def build_down(r):
        calls["down"] += 1
        return r.read_stage("up").withColumn("w", F.col("v") * 10)

    runner = MX.StageRunner(spark, run_dir)
    runner.run_stage("up", build_up)
    runner.run_stage("down", build_down, inputs=("up",))
    gen_up1 = runner.snapshot_id("up")
    # rebuild the input immediately (same wall-clock second as 'down')
    os.remove(os.path.join(run_dir, "up", MX.MANIFEST))
    runner.run_stage("up", build_up)
    assert runner.snapshot_id("up") > gen_up1  # monotonic snapshot ids
    # downstream must rebuild even though mtimes may tie at 1 s granularity
    runner2 = MX.StageRunner(spark, run_dir)
    out = runner2.run_stage("down", build_down, inputs=("up",))
    assert calls["down"] == 2
    assert out.agg(F.min("v")).collect()[0][0] == 2  # built from rebuilt input
    # snapshot-id-addressed read: a pinned stale id fails loudly
    assert runner2.read_stage("up", snapshot=runner2.snapshot_id("up")).count() == 5
    with pytest.raises(ValueError, match="rebuilt"):
        runner2.read_stage("up", snapshot=gen_up1)


def test_er_checkpointed_end_to_end(spark, dict_pack, tiny_corpus, tmp_path):
    t = transcripts(tiny_corpus)
    ad = alias_dict_df(spark, dict_pack)
    ents = entities_df(spark, dict_pack)
    bc = broadcast_embeddings(spark, EmbeddingMatrix.from_spark(embeddings_df(spark, dict_pack)))
    run_dir = str(tmp_path / "er_run")
    out = MX.run_er_checkpointed(spark, run_dir, t, ad, ents, bc_emb=bc)
    n = out.count()
    assert n == gold_mentions(tiny_corpus).count()
    # resumable: second call reads snapshots only (fast path, same rows)
    out2 = MX.run_er_checkpointed(spark, run_dir, t, ad, ents, bc_emb=bc)
    assert out2.count() == n


def test_build_alias_dict_counts(spark):
    obs = spark.createDataFrame(
        [
            # (alias, entity_name, clicked, from_query)
            ("acme corp", "Acme Corp", True, True),
            ("acme corp", "Acme Corp", True, True),
            ("acme corp", "Acme Corp", False, True),
            ("acme", "Acme Corp", True, False),
            ("acme", "Acme Labs", True, False),
            ("", "Nobody", True, True),
        ],
        ["alias", "entity_name", "clicked", "from_query"],
    )
    ad, names = D.build_alias_dict(obs)
    rows = {(r["alias"], r["entity_id"]): r for r in ad.collect()}
    nm = {r["name"]: r["entity_id"] for r in names.collect()}
    acme_corp = nm["Acme Corp"]
    r = rows[("acme corp", acme_corp)]
    assert r["QAT"] == 3 and r["QAEF"] == 2 and r["QAF"] == 2
    r2 = rows[("acme", acme_corp)]
    assert r2["LAT"] == 2 and r2["LAET"] == 1
    # empty alias filtered
    assert not any(a == "" for a, _ in rows)
    packed = D.pack_candidates(ad)
    p = {r["alias"]: r for r in packed.collect()}
    assert p["acme"]["n_candidates"] == 2


def test_coherence_prefers_consistent_entities(spark, dict_pack):
    """FEL's canonical coherence case: an ambiguous mention resolves to the
    entity coherent with its neighbors (test.txt semantics, FIXTURES.md §5)."""
    bc = broadcast_embeddings(spark, EmbeddingMatrix.from_spark(embeddings_df(spark, dict_pack)))
    ents = dict_pack.entities
    # two entities sharing the last name token
    name0 = ents.name[0]
    shared = name0.split()[-1]
    others = [i for i in range(1, dict_pack.n_entities) if ents.name[i].split()[-1] == shared]
    if not others:
        pytest.skip("no ambiguous last token in this pack")
    other = others[0]
    key = lambda i: "_wiki_" + ents.name[i].replace(" ", "_")  # noqa: E731
    cands_both = [
        {"entity_id": int(other), "entity_key": key(other), "name": ents.name[other]},
        {"entity_id": 0, "entity_key": key(0), "name": name0},
    ]
    rows = [
        # mention 1: unambiguous full name of entity 0
        ("c1", "m1", 0, name0, [{"entity_id": 0, "entity_key": key(0), "name": name0}]),
        # mention 2: ambiguous shared last token -> should pick entity 0
        ("c1", "m2", 1, shared, cands_both),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, mention_id string, order_idx int, surface string, "
        "candidates array<struct<entity_id:int, entity_key:string, name:string>>",
    )
    out = {r["mention_id"]: r["entity_id"] for r in coherent_assignments(df, bc).collect()}
    assert out["m1"] == 0
    assert out["m2"] == 0


def test_streaming_linking(spark, dict_pack, tiny_corpus, tmp_path):
    from fel_spark.operators.mentions import prepare_candidate_dict
    from fel_spark.streaming.incremental import link_stream, read_transcript_stream

    src = str(tmp_path / "stream_src")
    transcripts(tiny_corpus).limit(200).write.parquet(src)
    stream = read_transcript_stream(spark, src)
    assert stream.isStreaming
    cand_dict = prepare_candidate_dict(
        alias_dict_df(spark, dict_pack), entities_df(spark, dict_pack)
    )
    linked = link_stream(stream, cand_dict)
    q = (
        linked.writeStream.format("memory")
        .queryName("linked_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n from linked_stream_test").collect()[0]["n"]
    assert got > 0


def test_incremental_cluster_stream_stateful(spark, tmp_path):
    """applyInPandasWithState keeps per-block registries across micro-batches:
    a near-dup arriving in batch 2 adopts the cluster opened in batch 1."""
    from fel_spark.streaming.incremental import incremental_cluster_stream

    src = tmp_path / "reps_src"
    src.mkdir()
    schema = "block_key string, rep_id string, toks array<string>"
    b1 = spark.createDataFrame(
        [
            ("blk1", "r001", ["alpha", "beta", "gamma", "delta"]),
            ("blk1", "r002", ["zeta", "eta", "theta", "iota"]),
            ("blk2", "r003", ["solo", "tokens", "here"]),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    b2 = spark.createDataFrame(
        [
            # 3/5 overlap with r001 -> jaccard 0.6 >= 0.5 -> adopts r001
            ("blk1", "r010", ["alpha", "beta", "gamma", "epsilon"]),
            # no overlap -> new cluster
            ("blk1", "r011", ["mu", "nu", "xi", "omicron"]),
        ],
        schema,
    )
    b2.coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = incremental_cluster_stream(stream, threshold=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("incr_cluster_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r["rep_id"]: r["cluster_id"]
        for r in spark.sql("select * from incr_cluster_test").collect()
    }
    assert rows["r001"] == "r001"
    assert rows["r002"] == "r002"
    assert rows["r003"] == "r003"
    assert rows["r010"] == "r001", rows  # cross-micro-batch state adoption
    assert rows["r011"] == "r011"


def test_incremental_cluster_stream_equals_batch(spark, tmp_path):
    """VERDICT r3 #8: on a replayed corpus of WELL-SEPARATED near-dup
    groups (within-group Jaccard >= 0.5, cross-group < 0.5 — the regime
    where greedy first-match and transitive closure provably coincide),
    the streaming cluster PARTITIONS equal the batch
    `jaccard_exact_clusters` partitions. Labels differ by design (stream:
    first-arriving rep; batch: numeric min id), so the comparison is on
    member sets."""
    from pyspark.sql import functions as F

    from fel_spark.operators.dedup import jaccard_exact_clusters
    from fel_spark.streaming.incremental import incremental_cluster_stream

    # 6 planted groups x 3 members: member toks = group core (6 tokens) +
    # one member-specific token -> within-group J = 5/7 or 6/7 >= 0.5;
    # cores are disjoint -> cross-group J = 0
    rows = []
    for g in range(6):
        core = [f"g{g}tok{j}" for j in range(6)]
        for m in range(3):
            toks = core[: 5 + (m % 2)] + [f"g{g}extra{m}"]
            rows.append((f"blk{g % 2}", 100 * g + m, toks))
    schema = "block_key string, rep_id long, toks array<string>"
    df = spark.createDataFrame(rows, schema)

    batch = jaccard_exact_clusters(
        df.select(
            F.col("rep_id").alias("doc_id"),
            F.array_join("toks", " ").alias("text"),
        ),
        threshold=0.5,
    )
    batch_parts = {
        frozenset(r["ids"])
        for r in batch.groupBy("cluster_id")
        .agg(F.collect_set("doc_id").alias("ids"))
        .collect()
    }

    src = str(tmp_path / "reps_eq")
    df.select(
        "block_key", F.col("rep_id").cast("string").alias("rep_id"), "toks"
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("block_key string, rep_id string, toks array<string>")
        .parquet(src)
    )
    q = (
        incremental_cluster_stream(stream, threshold=0.5)
        .writeStream.format("memory")
        .queryName("incr_eq_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from incr_eq_test").collect()
    assert len(got) == len(rows)
    by_cluster: dict[str, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r["cluster_id"], set()).add(int(r["rep_id"]))
    stream_parts = {frozenset(v) for v in by_cluster.values()}
    assert stream_parts == batch_parts


def test_eval_xml_reader(spark, tmp_path):
    """S8: distributed eval-XML parse (WebscopeXmlReader semantics:
    flag defaults, duplicate-target drop, empty-target drop)."""
    from fel_spark.sources.evalxml import eval_annotations, read_eval_xml

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<sessions>
  <session id="s1">
    <query assessor="19" starttime="37.94" ambiguous="true">
      <text>brad pitt movies</text>
      <annotation main="true"><span>brad pitt</span><target>Brad_Pitt</target></annotation>
      <annotation><span>brad pitt</span><target>Brad_Pitt</target></annotation>
      <annotation><span>x</span><target>  </target></annotation>
    </query>
    <query navigational="true"><text>imdb</text></query>
  </session>
  <session id="s2">
    <query><text>paris hotels</text>
      <annotation><span>paris</span><target>Paris</target></annotation>
    </query>
  </session>
</sessions>"""
    p = tmp_path / "eval"
    p.mkdir()
    (p / "part1.xml").write_text(xml)

    df = read_eval_xml(spark, str(p))
    rows = {r["text"]: r for r in df.collect()}
    assert len(rows) == 3
    q1 = rows["brad pitt movies"]
    assert q1["session_id"] == "s1" and q1["ambiguous"] and not q1["adult"]
    assert q1["assessor"] == "19"
    # duplicate + empty targets dropped -> exactly one annotation survives
    assert len(q1["annotations"]) == 1
    assert q1["annotations"][0]["target"] == "Brad_Pitt"
    assert q1["annotations"][0]["main"] is True
    assert rows["imdb"]["navigational"] and rows["imdb"]["annotations"] == []

    gold = eval_annotations(df)
    g = {r["entity_id"]: r for r in gold.collect()}
    assert set(g) == {"Brad_Pitt", "Paris"}
    assert g["Paris"]["session_id"] == "s2"


def test_stage_runner_schema_evolution_propagates(spark, tmp_path):
    """Iceberg-style schema evolution across rebuilds: when an upstream
    stage is rebuilt with an ADDED column, the generation check invalidates
    the downstream snapshot and its rebuild sees the evolved schema —
    the stale downstream result (old schema, old rows) is never served."""
    run_dir = str(tmp_path / "run_evo")
    schema_v = {"v": 1}

    def build_src(r):
        df = spark.range(5).select(
            F.col("id"), (F.col("id") * 10).alias("val")
        )
        if schema_v["v"] == 2:
            df = df.withColumn("lang", F.lit("en"))
        return df

    def build_down(r):
        src = r.read_stage("src")
        # downstream projects everything — its schema follows the input's
        return src.withColumn("doubled", F.col("val") * 2)

    r1 = MX.StageRunner(spark, run_dir)
    r1.run_stage("src", build_src)
    d1 = r1.run_stage("down", build_down, inputs=("src",))
    assert "lang" not in d1.columns

    # upstream evolves: new column added, stage rebuilt (forced by
    # removing its manifest, the "re-run this stage" gesture)
    schema_v["v"] = 2
    os.remove(os.path.join(run_dir, "src", MX.MANIFEST))
    r2 = MX.StageRunner(spark, run_dir)
    r2.run_stage("src", build_src)
    d2 = r2.run_stage("down", build_down, inputs=("src",))
    assert "lang" in d2.columns  # stale old-schema snapshot NOT reused
    assert d2.count() == 5


def test_stage_runner_empty_snapshot_roundtrip(spark, tmp_path):
    """A stage that legitimately produces ZERO rows (filter drops all)
    must stay readable — in-run (run_stage's read-back) AND on resume
    (read_stage schema from the manifest) — including partitioned
    snapshots, where an empty write leaves no footers to infer from."""
    from fel_spark.plans.metrics import StageRunner

    run_dir = str(tmp_path / "empty_run")
    runner = StageRunner(spark, run_dir)
    src = spark.createDataFrame(
        [("a", "train", 1)], "doc_id string, split string, n int"
    )
    out = runner.run_stage(
        "none_left", lambda r: src.filter("n > 999"), partition_by=("split",)
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "n", "split"] or \
           [f.name for f in out.schema.fields] == ["doc_id", "split", "n"]
    # fresh runner = resume: manifest schema serves the empty snapshot
    resumed = StageRunner(spark, run_dir).read_stage("none_left")
    assert resumed.count() == 0
    assert set(f.name for f in resumed.schema.fields) == {"doc_id", "split", "n"}
