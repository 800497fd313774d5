"""WebDataset tar-shard ingestion (sources/webdataset.py)."""

from __future__ import annotations

import io
import tarfile

import numpy as np
import pytest

from fel_spark.sources import codecs as C
from fel_spark.sources.webdataset import (
    parse_tar_members,
    read_webdataset,
    read_webdataset_bytes,
    samples,
    synth_webdataset,
    synth_webdataset_bytes,
)


def test_parse_members_keys_and_exts():
    ms = list(parse_tar_members(synth_webdataset_bytes(0, 3)))
    assert [(k, e) for k, e, _p in ms] == [
        ("s00000", "png"), ("s00000", "txt"),
        ("s00001", "png"), ("s00001", "txt"),
        ("s00002", "png"), ("s00002", "txt"),
    ]
    # multi-suffix ext splits at the FIRST dot; dirs use the basename
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name in ("a/b/x.seg.png", "noext"):
            info = tarfile.TarInfo(name=name)
            info.size = 2
            tf.addfile(info, io.BytesIO(b"zz"))
    got = [(k, e) for k, e, _p in parse_tar_members(buf.getvalue())]
    assert got == [("x", "seg.png"), ("noext", "")]


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        list(parse_tar_members(b"definitely not a tar file" * 40))


def test_members_decode_with_codecs():
    ms = {(k, e): p for k, e, p in parse_tar_members(synth_webdataset_bytes(1, 2))}
    # shard_idx=1, n=2 -> global ids 2 and 3; first member is s00002
    assert ("s00002", "png") in ms
    img = C.decode_image(ms[("s00002", "png")])
    g = 2
    w, h = 16 + (g % 8) * 8, 16 + (g % 5) * 8
    assert img.shape == (h, w, 3)
    assert ms[("s00002", "txt")] == b"caption for sample 2"


def test_read_webdataset_files_and_samples(spark, tmp_path):
    path = synth_webdataset(spark, str(tmp_path / "wds"), shards=3, n=4)
    members = read_webdataset(spark, path + "/*.tar")
    assert members.count() == 3 * 4 * 2
    smp = samples(members, exts=("png", "txt", "json"))
    rows = {r.key: r for r in smp.collect()}
    assert len(rows) == 12
    r5 = rows["s00005"]
    assert r5.shard == "shard-00001.tar"
    assert bytes(r5.txt) == b"caption for sample 5"
    assert r5.json is None  # requested ext absent -> null
    g = 5
    img = C.decode_image(bytes(r5.png))
    assert img.shape == (16 + (g % 5) * 8, 16 + (g % 8) * 8, 3)


def test_in_memory_matches_files(spark, tmp_path):
    path = synth_webdataset(spark, str(tmp_path / "wds2"), shards=2, n=3)
    via_files = {
        (r.shard, r.key, r.ext, bytes(r.payload))
        for r in read_webdataset(spark, path + "/*.tar").collect()
    }
    mem = spark.createDataFrame(
        [(f"shard-{s:05d}.tar", bytearray(synth_webdataset_bytes(s, 3)))
         for s in range(2)],
        "path string, content binary",
    )
    via_mem = {
        (r.shard, r.key, r.ext, bytes(r.payload))
        for r in read_webdataset_bytes(mem).collect()
    }
    assert via_files == via_mem


def test_samples_flow_into_media_neardup(spark):
    """Shard members -> samples -> the media near-dup chain: a duplicated
    shard's PNGs land in the same perceptual-hash clusters."""
    from fel_spark.sources.multimodal import image_phash_pairs
    import pyspark.sql.functions as F

    mem = spark.createDataFrame(
        [("shard-a.tar", bytearray(synth_webdataset_bytes(0, 4))),
         ("shard-b.tar", bytearray(synth_webdataset_bytes(0, 4)))],
        "path string, content binary",
    )
    smp = samples(read_webdataset_bytes(mem), exts=("png",))
    media = smp.select(
        F.concat_ws(":", "shard", "key").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("png").alias("payload"),
    )
    pairs = image_phash_pairs(media, max_hamming=2).collect()
    # each of the 4 samples appears in both shards -> 4 identical pairs
    got = {tuple(sorted((r.id_a, r.id_b))) for r in pairs}
    assert {("shard-a.tar:s%05d" % g, "shard-b.tar:s%05d" % g) for g in range(4)} <= got
