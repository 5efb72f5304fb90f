"""P8 — checkpoint / resume (SURVEY §2.1, BASELINE.json:6).

Persist ``(vertex state, superstep, per-partition lineage, message
metrics)`` every k supersteps; resume mid-iteration bit-identically.

Storage: Iceberg when the session has an Iceberg catalog configured;
otherwise a partitioned-parquet + ``_meta.json`` manifest layout that
mimics a snapshot (SURVEY §7.6 risk 1 — no Iceberg jars in this
sandbox, the code path to Iceberg is config-only).  Writes are atomic
per checkpoint: data lands in ``superstep=NNNNNN/`` and the manifest
``_meta.json`` is written last — resume reads the newest directory
that has a manifest.

Bit-identity contract (SURVEY §4.3): the checkpoint is the source of
truth.  Resume reads the exact stored values (parquet round-trips
doubles bitwise); recomputation from superstep *s* matches allclose
1e-6 and integer algorithms (CC/LP/TC) match exactly.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STEP_DIR = re.compile(r"^superstep=(\d{6})$")


class CheckpointManager:
    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _step_dir(self, superstep: int) -> str:
        return os.path.join(self.directory, f"superstep={superstep:06d}")

    def write(self, vertices: DataFrame, superstep: int, meta: dict) -> DataFrame:
        """Write vertex state + manifest; return the re-read (lineage-
        truncated) DataFrame so the caller continues from storage.

        The write lands in a temp dir and is swapped in afterwards:
        ``vertices``' own lineage may read THIS superstep's previous
        files (re-checkpoint of the same step), and a direct
        mode=overwrite deletes the target before the job runs — a
        write-into-own-input failure that AQE masks (its shuffle map
        stages drain the input first) but plain execution hits."""
        path = self._step_dir(superstep)
        data_path = os.path.join(path, "vertices")
        tmp_path = os.path.join(path, "_vertices.tmp")
        vertices.write.mode("overwrite").parquet(tmp_path)
        if os.path.exists(data_path):
            shutil.rmtree(data_path)
        os.replace(tmp_path, data_path)
        reread = self.spark.read.parquet(data_path)
        # Per-partition lineage: row count per physical partition of the
        # state as stored (BASELINE.json:6 "per-partition lineage").
        part_counts = (
            reread.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .orderBy("partition")
            .collect()
        )
        manifest = {
            "superstep": superstep,
            "written_at": time.time(),
            "partition_lineage": {str(r["partition"]): r["count"] for r in part_counts},
            **meta,
        }
        tmp = os.path.join(path, "_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True, default=str)
        os.replace(tmp, os.path.join(path, "_meta.json"))
        return reread

    def latest(self, include_final: bool = True) -> tuple[int, dict] | None:
        """Newest superstep with a complete manifest, or None.  With
        ``include_final=False``, checkpoints marked ``final`` (converged
        results, different schema than mid-run state) are skipped —
        that's what resume-of-an-interrupted-run wants."""
        candidates: list[tuple[int, dict]] = []
        for name in os.listdir(self.directory):
            m = _STEP_DIR.match(name)
            if not m:
                continue
            meta_path = os.path.join(self.directory, name, "_meta.json")
            if not os.path.exists(meta_path):
                continue  # incomplete write — ignore
            with open(meta_path) as f:
                meta = json.load(f)
            if not include_final and meta.get("final"):
                continue
            candidates.append((int(m.group(1)), meta))
        if not candidates:
            return None
        return max(candidates, key=lambda kv: kv[0])

    def read(self, superstep: int) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._step_dir(superstep), "vertices")
        )

    # ---- topology snapshots (mutation runs) --------------------------
    # A mutate_edges program makes the edge table part of the run's
    # state; without it a resume would replay against the ORIGINAL
    # edges.  The loop writes the post-mutation edge table alongside
    # each vertex checkpoint (zstd parquet — edges dominate snapshot
    # bytes); resume reads it back.  Written AFTER the vertex manifest:
    # a crash in between leaves a checkpoint whose missing snapshot the
    # resume path rejects loudly rather than resuming wrong.

    def write_edges(self, edges: DataFrame, superstep: int) -> None:
        path = self._step_dir(superstep)
        data_path = os.path.join(path, "edges")
        tmp_path = os.path.join(path, "_edges.tmp")
        edges.write.mode("overwrite").option("compression", "zstd").parquet(
            tmp_path
        )
        if os.path.exists(data_path):
            shutil.rmtree(data_path)
        os.replace(tmp_path, data_path)
        meta_path = os.path.join(path, "_meta.json")
        if os.path.exists(meta_path):  # record the snapshot in lineage
            with open(meta_path) as f:
                meta = json.load(f)
            meta["edges_snapshot"] = True
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f, indent=2, sort_keys=True, default=str)
            os.replace(tmp, meta_path)

    def has_edges(self, superstep: int) -> bool:
        return os.path.isdir(os.path.join(self._step_dir(superstep), "edges"))

    def read_edges(self, superstep: int) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._step_dir(superstep), "edges")
        )
