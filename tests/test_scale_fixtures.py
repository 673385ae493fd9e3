"""The sf1 spot-bench fixtures (scripts/gen_scale_fixtures.py): 10x
replicas written as multi-part directories so scan parallelism measures
the plan, not input-split starvation (VERDICT r8 task 4)."""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.gen_scale_fixtures import N_PARTS, REPLICAS, ensure_sf1

SRC = "/root/testdata/sf0.01"  # small source keeps the test fast


def _rows(path):
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def test_multi_part_layout_and_replica_scaling(tmp_path):
    out = ensure_sf1(SRC, str(tmp_path / "sf1"))
    for t in ("documents", "embeddings", "events"):
        d = os.path.join(out, f"{t}.parquet")
        assert os.path.isdir(d), f"{t} must be a directory of parts"
        parts = glob.glob(os.path.join(d, "*.parquet"))
        assert len(parts) == N_PARTS
        src_rows = pq.ParquetFile(os.path.join(SRC, f"{t}.parquet")).metadata.num_rows
        assert _rows(d) == src_rows * REPLICAS
        # round-robin slicing: no empty parts (every part carries rows)
        assert all(pq.ParquetFile(p).metadata.num_rows > 0 for p in parts)


def test_stale_single_file_layout_is_rebuilt(tmp_path):
    out = str(tmp_path / "sf1")
    ensure_sf1(SRC, out)
    # simulate the pre-round-9 layout: one file where the directory goes
    import shutil

    d = os.path.join(out, "documents.parquet")
    shutil.rmtree(d)
    with open(d, "wb") as f:
        f.write(b"stale")
    assert ensure_sf1(SRC, out) == out
    assert os.path.isdir(d) and len(glob.glob(os.path.join(d, "*.parquet"))) == N_PARTS


def test_idempotent_second_call_keeps_layout(tmp_path):
    out = str(tmp_path / "sf1")
    ensure_sf1(SRC, out)
    d = os.path.join(out, "documents.parquet")
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(d, "*.parquet"))}
    ensure_sf1(SRC, out)
    assert {p: os.path.getmtime(p) for p in glob.glob(os.path.join(d, "*.parquet"))} == mtimes
