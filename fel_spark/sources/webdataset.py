"""WebDataset-style tar-shard ingestion — the container format multimodal
training pipelines actually ship samples in, pure stdlib (tarfile).

A WebDataset shard is a plain tar whose member names encode sample
grouping: ``<key>.<ext>`` — every member sharing a key belongs to one
sample (e.g. ``000017.png`` + ``000017.txt`` + ``000017.json``). Shards
are sequential tars, so the natural parallel grain is one shard per task
(same argument as WARC segments: a training corpus has thousands of
shards, far more than executor slots).

- `parse_tar_members(raw)` — (key, ext, payload) triples from tar bytes
  (ustar/pax, as written by `tarfile`; nested dirs allowed, the key is
  the basename up to the FIRST dot so multi-suffix exts like
  ``.seg.png`` group correctly)
- `read_webdataset(spark, path)` / `read_webdataset_bytes(files)` —
  binaryFile -> mapInPandas -> long (shard, key, ext, payload) rows
- `samples(members, exts)` — pivot the long rows into one row per
  sample with a binary column per requested ext (missing -> null)
- `synth_webdataset_bytes(...)` — deterministic shard with REAL PNG
  image members + text captions (closed-form pixel sums via the same
  gradient the codec oracles use)

The media columns decode with `sources/codecs.py` — a shard's PNG
members flow straight into decode stats / near-dup / filtering.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEMBER_SCHEMA = "shard string, key string, ext string, payload binary"


def parse_tar_members(raw: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (key, ext, payload) for each regular file member. The sample
    key is the basename up to the first dot; the ext is everything after
    it (so ``x.seg.png`` -> key ``x``, ext ``seg.png``)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(raw), mode="r:*")
    except tarfile.TarError as e:
        raise ValueError(f"not a readable tar shard: {e}") from e
    with tf:
        for member in tf:
            if not member.isfile():
                continue
            base = member.name.rsplit("/", 1)[-1]
            if "." in base:
                key, ext = base.split(".", 1)
            else:
                key, ext = base, ""
            f = tf.extractfile(member)
            if f is None:
                continue
            yield key, ext, f.read()


def read_webdataset_bytes(files: DataFrame) -> DataFrame:
    """(path, content) rows of whole tar shards -> long member rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("shard", "key", "ext", "payload")}
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = str(path).rsplit("/", 1)[-1]
                for key, ext, payload in parse_tar_members(bytes(content)):
                    rows["shard"].append(shard)
                    rows["key"].append(key)
                    rows["ext"].append(ext)
                    rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(gen, schema=MEMBER_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Tar shards -> long member rows, one task per shard file."""
    return read_webdataset_bytes(spark.read.format("binaryFile").load(path))


def samples(members: DataFrame, exts: tuple[str, ...]) -> DataFrame:
    """Pivot long member rows into one row per (shard, key) sample with a
    binary column per requested ext (named by the ext with dots ->
    underscores; absent members are null). A plain groupBy-agg pivot —
    one shuffle keyed by sample, no collect."""
    aggs = [
        F.max(F.when(F.col("ext") == e, F.col("payload"))).alias(
            e.replace(".", "_")
        )
        for e in exts
    ]
    return members.groupBy("shard", "key").agg(*aggs)


# ---------------------------------------------------------------------------
# deterministic synth


def synth_webdataset_bytes(shard_idx: int, n: int = 8) -> bytes:
    """A tar shard of n samples: sample k (global id g = shard_idx*n + k)
    has a REAL PNG member ``s<g>.png`` (the codec-oracle gradient r=x,
    g=y, b=(g*7)%256 at w=16+(g%8)*8, h=16+(g%5)*8) and a caption member
    ``s<g>.txt`` = 'caption for sample <g>'. Written with stdlib tarfile
    (deterministic: epoch mtimes, fixed uids)."""
    from fel_spark.sources.codecs import encode_png

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for k in range(n):
            g = shard_idx * n + k
            w = 16 + (g % 8) * 8
            h = 16 + (g % 5) * 8
            img = np.empty((h, w, 3), dtype=np.uint8)
            img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]
            img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]
            img[:, :, 2] = (g * 7) % 256
            png = encode_png(img, filter_type=g % 5)
            for name, payload in (
                (f"s{g:05d}.png", png),
                (f"s{g:05d}.txt", f"caption for sample {g}".encode()),
            ):
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def synth_webdataset(spark: SparkSession, tmp_dir: str, shards: int = 3,
                     n: int = 8) -> str:
    """Write `shards` tar shards under tmp_dir; returns the dir."""
    import os

    os.makedirs(tmp_dir, exist_ok=True)
    for s in range(shards):
        with open(os.path.join(tmp_dir, f"shard-{s:05d}.tar"), "wb") as fh:
            fh.write(synth_webdataset_bytes(s, n))
    return tmp_dir
