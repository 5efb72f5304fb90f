"""Stateful cross-batch turn linking (streaming/stateful.py,
``applyInPandasWithState``):

1. hand-checked micro case — a conversation split across two
   micro-batches still links the boundary pair;
2. stream-vs-batch equivalence — every conversation split
   mid-conversation across two files, processed one file per trigger:
   the consolidated snapshot equals build_edges over the union (the
   exact property the foreachBatch path documents it CANNOT give).
"""

import os
import time

from pyspark.sql import functions as F

from mesos_pregel_spark.fixtures import generate_transcripts
from mesos_pregel_spark.functions.edges import build_edges
from mesos_pregel_spark.streaming.stateful import (
    stateful_edge_stream,
    stateful_edges_snapshot,
)


def _edge_map(df):
    return {
        (r["src_actor"], r["dst_actor"]): r["weight"] for r in df.collect()
    }


def _run(spark, input_dir, trans_dir, ckpt_dir, max_files=1):
    q = stateful_edge_stream(
        spark, input_dir, trans_dir, ckpt_dir,
        max_files_per_trigger=max_files,
    )
    q.awaitTermination(180)
    for _ in range(60):
        if not q.isActive:
            break
        time.sleep(1)
    assert not q.isActive


def _write_file(df, input_dir, name, mtime, tmp_root):
    """One flat parquet FILE directly in ``input_dir`` (the file
    source does not recurse into subdirs) with a pinned mtime so
    FileStreamSource's mod-time ordering processes the halves in
    arrival order."""
    import glob
    import shutil

    stage = os.path.join(tmp_root, f"stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(input_dir, exist_ok=True)
    dest = os.path.join(input_dir, f"{name}.parquet")
    shutil.copyfile(part, dest)
    os.utime(dest, (mtime, mtime))


def test_boundary_pair_is_linked(spark, tmp_path):
    """conv X: [role:user, role:assistant] in batch 1, [tool:web] in
    batch 2 — the (assistant → tool) edge exists ONLY if state carried
    the last actor across the batch boundary."""
    from mesos_pregel_spark.fixtures import TRANSCRIPT_SCHEMA
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows1 = [("X", 0, "user", "hi", None, ts), ("X", 1, "assistant", "yo", None, ts)]
    rows2 = [("X", 2, "assistant", "…", "web", ts)]
    d1 = spark.createDataFrame(rows1, TRANSCRIPT_SCHEMA)
    d2 = spark.createDataFrame(rows2, TRANSCRIPT_SCHEMA)

    input_dir = str(tmp_path / "in")
    now = time.time()
    _write_file(d1, input_dir, "f1", now - 60, str(tmp_path))
    _write_file(d2, input_dir, "f2", now, str(tmp_path))

    _run(spark, input_dir, str(tmp_path / "tr"), str(tmp_path / "ck"))
    snap = _edge_map(stateful_edges_snapshot(spark, str(tmp_path / "tr")))
    assert snap == {
        ("role:user", "role:assistant"): 1.0,
        ("role:assistant", "tool:web"): 1.0,
    }


def test_split_conversations_equal_batch(spark, tmp_path):
    """Every conversation cut in half across two files → snapshot must
    still equal the batch pipeline over all turns."""
    t = generate_transcripts(spark, n_conv=80, seed=42).persist()
    mid = F.col("turn_idx") < 3  # generated convs have ≥ 2 turns; many > 3
    first, second = t.where(mid), t.where(~mid)
    assert second.count() > 0  # the split is real

    input_dir = str(tmp_path / "in")
    now = time.time()
    _write_file(first, input_dir, "f1", now - 60, str(tmp_path))
    _write_file(second, input_dir, "f2", now, str(tmp_path))

    _run(spark, input_dir, str(tmp_path / "tr"), str(tmp_path / "ck"))
    snap = _edge_map(stateful_edges_snapshot(spark, str(tmp_path / "tr")))
    assert snap == _edge_map(build_edges(t))
    t.unpersist()
