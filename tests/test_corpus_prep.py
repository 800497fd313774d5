"""End-to-end corpus-prep plan: filter -> exact dedup -> near dedup ->
split -> pack, checkpointed and resumable."""

from __future__ import annotations

from fel_spark.plans.corpus import run_corpus_prep


def _docs(spark):
    base = (
        "the quick brown fox jumps over a lazy dog and then walks to town "
        "for supper while night falls on quiet streets of old houses near "
        "the river bank where %s boats drift under stars"
    )
    rows = [
        (1, base % "small"),
        (2, base % "small"),          # exact duplicate of 1
        (3, base % "large"),          # near-duplicate of 1 (one token off)
        (4, "too short"),             # filtered out (f_short)
        (5, base % "painted"),        # near-duplicate of 1
        (6, "a different story begins in the harbor where sailors trade "
            "spices and silk for iron tools while merchants count coins on "
            "wooden tables near the old lighthouse at dawn"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_corpus_prep_end_to_end_and_resume(spark, tmp_path):
    run_dir = str(tmp_path / "run1")
    packed = run_corpus_prep(
        spark,
        run_dir,
        _docs(spark),
        pack_budget=16,
        pack_shards=2,
        neardup_kwargs={"jaccard_threshold": 0.8},
    )
    rows = packed.collect()
    ids = {r["doc_id"] for r in rows}
    # doc 4 filtered; 2 collapsed into 1 (exact); 3 and 5 collapsed into
    # 1's cluster (near); 6 survives on its own
    assert ids == {1, 6}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["n_tokens"] > 0 and r["start_offset"] >= 0 for r in rows)

    # resume: a second run reads snapshots (stage manifests exist) and
    # returns the same manifest
    again = run_corpus_prep(
        spark,
        run_dir,
        _docs(spark).limit(0),  # inputs ignored on resume — snapshots win
        pack_budget=16,
        pack_shards=2,
    )
    assert {r["doc_id"] for r in again.collect()} == ids

    # audit trail materialized for every stage
    aux = {p.name for p in (tmp_path / "run1" / "_aux").iterdir()}
    assert {
        "filter_audit",
        "exact_dedup_audit",
        "near_dedup_audit",
        "split_audit",
        "packing_audit",
    } <= aux


def test_corpus_prep_with_decontamination_stage(spark, tmp_path):
    # eval set shares doc 6's harbor sentence -> doc 6 dropped before split
    ev = spark.createDataFrame(
        [
            (900, "a different story begins in the harbor where sailors "
                  "trade spices and silk for iron tools"),
        ],
        ["doc_id", "text"],
    )
    packed = run_corpus_prep(
        spark,
        str(tmp_path / "run_decon"),
        _docs(spark),
        pack_budget=16,
        pack_shards=2,
        neardup_kwargs={"jaccard_threshold": 0.8},
        eval_docs=ev,
        decon_kwargs={"window": 8},
    )
    ids = {r["doc_id"] for r in packed.collect()}
    assert ids == {1}
    aux = {p.name for p in (tmp_path / "run_decon" / "_aux").iterdir()}
    assert "decontaminate_audit" in aux


def test_corpus_prep_with_semantic_dedup_stage(spark, tmp_path):
    import numpy as np

    # docs 1 and 6 survive the lexical stages but are semantic duplicates;
    # keep-farthest-from-centroid retains 6 (lower cent_cos) and drops 1
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (6, [0.999, 0.01])],
        "doc_id long, embedding array<double>",
    )
    packed = run_corpus_prep(
        spark,
        str(tmp_path / "run_sem"),
        _docs(spark),
        pack_budget=16,
        pack_shards=2,
        neardup_kwargs={"jaccard_threshold": 0.8},
        doc_embeddings=emb,
        semdedup_kwargs={
            "threshold": 0.99,
            "centroids": np.array([[1.0, 0.0]]),
        },
    )
    ids = {r["doc_id"] for r in packed.collect()}
    assert ids == {6}
    aux = {p.name for p in (tmp_path / "run_sem" / "_aux").iterdir()}
    assert "semantic_dedup_audit" in aux


def test_corpus_prep_inserted_stage_invalidates_downstream(spark, tmp_path):
    """Regression: adding eval_docs to a COMPLETED run_dir used to run the
    new decontaminated stage but silently reuse the stale split/pack
    snapshots (manifest-only resume), returning the contaminated manifest.
    Staleness is now mtime-chained: a rebuilt input invalidates downstream."""
    import time as _time

    run_dir = str(tmp_path / "run_stale")
    first = run_corpus_prep(
        spark, run_dir, _docs(spark),
        pack_budget=16, pack_shards=2,
        neardup_kwargs={"jaccard_threshold": 0.8},
    )
    assert {r["doc_id"] for r in first.collect()} == {1, 6}

    _time.sleep(1.1)  # ensure the new stage manifest mtime strictly advances
    ev = spark.createDataFrame(
        [(900, "a different story begins in the harbor where sailors "
               "trade spices and silk for iron tools")],
        ["doc_id", "text"],
    )
    again = run_corpus_prep(
        spark, run_dir, _docs(spark),
        pack_budget=16, pack_shards=2,
        neardup_kwargs={"jaccard_threshold": 0.8},
        eval_docs=ev, decon_kwargs={"window": 8},
    )
    # doc 6 is contaminated: the re-run must NOT serve the stale manifest
    assert {r["doc_id"] for r in again.collect()} == {1}


def test_corpus_prep_with_media_stage(spark, tmp_path):
    import pyspark.sql.functions as F

    from fel_spark.sources.multimodal import MEDIA_SCHEMA, synth_media_real

    good = synth_media_real(spark, 9)
    bad = spark.createDataFrame(
        [("xbad", "image", bytearray(b"\x89PNGnot-really"),
          {"width": None, "height": None, "duration_ms": None, "codec": "png"})],
        schema=MEDIA_SCHEMA,
    )
    run_dir = str(tmp_path / "run_media")
    run_corpus_prep(
        spark, run_dir, _docs(spark), pack_budget=16, pack_shards=2,
        media=good.unionByName(bad),
        media_kwargs={"min_frames": 4},
    )
    kept = spark.read.parquet(f"{run_dir}/media_filtered")
    ids = {r.media_id for r in kept.select("media_id").collect()}
    assert "xbad" not in ids                      # corrupt payload flagged, not fatal
    # videos are i%3==2 with nf = 3 + ((i//3)%3): i=2 -> 3 frames (drop),
    # i=5 -> 4, i=8 -> 5 (keep)
    assert "m00002" not in ids and {"m00005", "m00008"} <= ids
    # audit materialized with per-reason counts
    audit = spark.read.parquet(f"{run_dir}/_aux/media_filter_audit")
    reasons = {r.reason for r in audit.filter(~F.col("keep")).collect()}
    assert {"undecodable", "too_few_frames"} <= reasons


def test_media_filter_decisions_rules(spark):
    from fel_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        media_filter_decisions,
        synth_media_real,
    )

    # kind mismatch: a valid WAV payload labeled "image"
    wav_row = synth_media_real(spark, 2).filter("kind = 'audio'").collect()[0]
    mism = spark.createDataFrame(
        [("xmis", "image", bytes(wav_row.payload),
          {"width": None, "height": None, "duration_ms": None, "codec": "wav"})],
        schema=MEDIA_SCHEMA,
    )
    dec = {r.media_id: r for r in media_filter_decisions(
        synth_media_real(spark, 3).unionByName(mism),
        min_width=40, min_samples=10_000,
    ).collect()}
    assert dec["xmis"].reason == "kind_mismatch" and not dec["xmis"].keep
    assert dec["m00000"].reason == "too_small"        # 16x16 image < 40 wide
    assert dec["m00001"].reason == "too_short"        # 800 samples < 10000
    assert dec["m00002"].keep                         # 3 frames >= default 2


def test_corpus_prep_media_dedup_stage(spark, tmp_path):
    from fel_spark.sources.multimodal import (
        synth_patterned_images,
        synth_toned_audio,
    )

    media = synth_patterned_images(spark, 4).unionByName(
        synth_toned_audio(spark, 3)
    )  # 4+4 images, 3+3 audio: half are planted near-dup copies
    run_dir = str(tmp_path / "run_media_dedup")
    run_corpus_prep(
        spark, run_dir, _docs(spark), pack_budget=16, pack_shards=2,
        media=media, media_dedup=True,
    )
    kept = spark.read.parquet(f"{run_dir}/media_deduped")
    ids = {r.media_id for r in kept.select("media_id").collect()}
    assert ids == {f"p{i:04d}" for i in range(4)} | {f"a{i:04d}" for i in range(3)}
    audit = spark.read.parquet(f"{run_dir}/_aux/media_dedup_audit")
    rows = {r.kind: (r.n_in, r.n_kept) for r in audit.collect()}
    assert rows == {"image": (8, 4), "audio": (6, 3)}
