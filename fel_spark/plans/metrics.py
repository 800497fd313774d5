"""Checkpointed, resumable multi-stage runs with per-partition lineage
metrics (north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

The reference's pipeline is a bash driver with stage gating
(`bash/mine-datapack.sh:18-236` — each stage writes files, re-runs skip
completed stages). Spark-first restatement: every stage materializes to a
Parquet dataset under a run directory with a `_STAGE_SUCCESS` manifest; a
re-run skips stages whose manifest exists (resumability = storage snapshots,
the Iceberg pattern — Parquet-with-manifest here because the sandbox has no
Iceberg jars; the write/read surface is identical).

Per-partition lineage: each stage logs a `_metrics` dataset with one row per
output partition (partition id, row count, stage, wall time, input stage
names) — the audit trail a 100 TB run needs to diagnose skew and data loss.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_STAGE_SUCCESS"


@dataclass
class StageRunner:
    spark: SparkSession
    run_dir: str
    metrics: list[dict] = field(default_factory=list)

    def _stage_path(self, name: str) -> str:
        return os.path.join(self.run_dir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_path(name), MANIFEST)

    def is_done(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def _read_manifest(self, name: str) -> dict:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def snapshot_id(self, name: str) -> int | None:
        """The stage's snapshot id: a run-level monotonic build counter
        stamped into the manifest at write time (the Iceberg snapshot-id
        analogue). None for missing/legacy manifests."""
        gen = self._read_manifest(name).get("generation")
        return int(gen) if gen is not None else None

    def _next_generation(self) -> int:
        """Monotonic per-run build counter. Unlike mtimes it is immune to
        coarse (1 s) filesystem timestamp granularity — an input rebuilt in
        the same second as a downstream snapshot still gets a strictly
        larger generation (ADVICE r3)."""
        path = os.path.join(self.run_dir, "_GENERATION")
        try:
            with open(path) as f:
                gen = int(f.read().strip() or 0)
        except (OSError, ValueError):
            gen = 0
        gen += 1
        os.makedirs(self.run_dir, exist_ok=True)
        with open(path, "w") as f:
            f.write(str(gen))
        return gen

    def _is_stale(self, name: str, inputs: tuple[str, ...]) -> bool:
        """A completed stage is stale when any input stage's snapshot id
        differs from the one recorded when this stage was built — e.g. a
        pipeline re-run that inserted a new upstream stage (decontamination
        added to a finished corpus run) rebuilt an input AFTER this stage's
        snapshot was written. Without this check the downstream snapshots
        would be silently reused and the run would return pre-insertion
        results. Legacy manifests without generations fall back to the
        mtime comparison."""
        mani = self._read_manifest(name)
        recorded = mani.get("input_generations")
        if mani.get("generation") is not None and recorded is not None:
            return any(
                self.is_done(i) and self.snapshot_id(i) != recorded.get(i)
                for i in inputs
            )
        mine = os.path.getmtime(self._manifest_path(name))
        return any(
            self.is_done(i) and os.path.getmtime(self._manifest_path(i)) > mine
            for i in inputs
        )

    def run_stage(
        self,
        name: str,
        build: callable,
        inputs: tuple[str, ...] = (),
        partition_by: tuple[str, ...] = (),
    ) -> DataFrame:
        """Materialize ``build()`` to parquet once; later runs read the
        snapshot unless an input stage has been rebuilt since (see
        :meth:`_is_stale`). ``build`` receives this runner (to read input
        stages)."""
        path = self._stage_path(name)
        if self.is_done(name) and not self._is_stale(name, inputs):
            return self.spark.read.parquet(path)

        t0 = time.time()
        df = build(self)
        writer = df.write.mode("overwrite").option("compression", "zstd")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        wall = time.time() - t0

        # read back with the build's schema: a stage that legitimately
        # produces ZERO rows (e.g. a filter that drops everything) writes
        # a snapshot with no data files, and schema inference on it fails
        # with UNABLE_TO_INFER_SCHEMA — the explicit schema keeps empty
        # snapshots readable (and skips footer-based inference besides)
        out = self.spark.read.schema(df.schema).parquet(path)
        part_stats = (
            out.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        stage_metrics = {
            "stage": name,
            "inputs": list(inputs),
            "generation": self._next_generation(),
            "input_generations": {i: self.snapshot_id(i) for i in inputs},
            "wall_sec": round(wall, 3),
            "rows": int(sum(r["rows"] for r in part_stats)),
            "partitions": len(part_stats),
            "max_partition_rows": int(max((r["rows"] for r in part_stats), default=0)),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            # persisted so read_stage can serve empty snapshots on RESUME
            # too (schema inference has no footers to look at)
            "schema_json": df.schema.json(),
        }
        self.metrics.append(stage_metrics)
        self._write_metrics(name, part_stats, stage_metrics)
        with open(self._manifest_path(name), "w") as f:
            json.dump(stage_metrics, f)
        return out

    def _write_metrics(self, name: str, part_stats, stage_metrics) -> None:
        rows = [
            (name, int(r["_pid"]), int(r["rows"]), stage_metrics["wall_sec"])
            for r in part_stats
        ]
        mdf = self.spark.createDataFrame(
            rows, "stage string, partition_id int, rows long, stage_wall_sec double"
        )
        mdf.write.mode("append").parquet(os.path.join(self.run_dir, "_metrics"))

    def log_aux(self, name: str, df: DataFrame) -> None:
        """Append a small auxiliary metrics DataFrame (e.g. dropped-block
        volume from `blocking.capped_block_stats`) to the run's audit
        trail."""
        df.write.mode("append").parquet(os.path.join(self.run_dir, "_aux", name))

    def read_stage(self, name: str, snapshot: int | None = None) -> DataFrame:
        """Read a stage's materialized snapshot. ``snapshot`` pins the read
        to a specific snapshot id (the Iceberg snapshot-id-addressed-read
        analogue): if the stage on disk is NOT that snapshot — rebuilt
        since the caller recorded the id — the read fails loudly instead
        of silently serving different data."""
        if snapshot is not None:
            cur = self.snapshot_id(name)
            if cur != snapshot:
                raise ValueError(
                    f"stage '{name}' is at snapshot {cur}, not the requested "
                    f"{snapshot}; it was rebuilt since the id was recorded "
                    "(parquet-with-manifest keeps only the latest snapshot — "
                    "re-resolve or re-run the downstream stage)"
                )
        schema_json = self._read_manifest(name).get("schema_json")
        reader = self.spark.read
        if schema_json:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
        return reader.parquet(self._stage_path(name))

    def metrics_df(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.run_dir, "_metrics"))


def run_er_checkpointed(
    spark: SparkSession,
    run_dir: str,
    transcripts: DataFrame,
    alias_dict: DataFrame,
    entities: DataFrame,
    bc_emb=None,
) -> DataFrame:
    """The ER pipeline as resumable materialized stages.

    Stages: linked_mentions -> rep_clusters -> clustered_mentions. A re-run
    after a crash resumes from the last completed snapshot; per-partition
    counts land in `_metrics`.
    """
    from fel_spark.operators import blocking, cluster, mentions as M, scoring

    runner = StageRunner(spark, run_dir)

    linked = runner.run_stage(
        "linked_mentions",
        lambda r: M.link_mentions(transcripts, alias_dict, entities, bc_emb=bc_emb),
    )

    def build_rep_clusters(r: StageRunner) -> DataFrame:
        lm = r.read_stage("linked_mentions")
        reps = (
            lm.select("span", "entity_id", "entity_key")
            .dropDuplicates(["span", "entity_id"])
            .withColumn(
                "mention_id",
                F.concat_ws("#e", "span", F.col("entity_id").cast("string")),
            )
        )
        keys = blocking.blocking_keys(reps)
        # audit the salting trade: how many hot blocks, how many intra-block
        # pairs the cap drops (recoverable via multi-key + closure)
        r.log_aux("capped_blocks", blocking.capped_block_stats(keys))
        blocked = blocking.cap_blocks(keys)
        pairs = blocking.candidate_pairs(
            blocked, payload_cols=("span", "entity_id", "entity_key")
        )
        scored = scoring.score_pairs(pairs, bc_emb=bc_emb)
        edges = scoring.match_edges(scored)
        cc = cluster.connected_components(edges)
        return reps.join(cc, reps.mention_id == cc.id, "left").select(
            "span",
            "entity_id",
            F.coalesce("component", "mention_id").alias("cluster_id"),
        )

    runner.run_stage("rep_clusters", build_rep_clusters, inputs=("linked_mentions",))

    def build_clustered(r: StageRunner) -> DataFrame:
        lm = r.read_stage("linked_mentions")
        rc = r.read_stage("rep_clusters")
        return lm.join(F.broadcast(rc), ["span", "entity_id"], "left")

    return runner.run_stage(
        "clustered_mentions", build_clustered, inputs=("linked_mentions", "rep_clusters")
    )
