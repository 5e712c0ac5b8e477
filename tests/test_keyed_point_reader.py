"""_KeyedPointReader: exact point reads over key-sorted parquet files.

Pure pyarrow tests (no Spark): correctness vs a full scan, multi-file /
multi-row-group selection, duplicate keys spanning a row-group boundary,
and the unsorted-file fallback (load() -> None).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq
import pytest

from infidex_spark.query.executor import _KeyedPointReader


def _write(dirpath: str, name: str, keys: list[str], row_group_size: int):
    vals = list(range(len(keys)))
    tbl = pa.table({"k": keys, "v": vals})
    pq.write_table(
        tbl, os.path.join(dirpath, name), row_group_size=row_group_size
    )


@pytest.fixture()
def kp_dir(tmp_path):
    d = str(tmp_path / "tbl")
    os.makedirs(d)
    # two sorted files with interleaved key ranges (the xxhash-sub-split
    # shape): stats intervals overlap, only exact lookup can tell the
    # owner apart
    _write(d, "a.parquet", [f"k{i:03d}" for i in range(0, 100, 2)], 7)
    _write(d, "b.parquet", [f"k{i:03d}" for i in range(1, 100, 2)], 7)
    return d


def test_fetch_equals_full_scan(kp_dir):
    dataset = ds.dataset(kp_dir)
    pr = _KeyedPointReader(dataset, "k")
    probes = ["k000", "k001", "k051", "k098", "k099", "kzzz", "a"]
    tbls = pr.fetch(probes, ["k", "v"])
    assert tbls is not None
    got = {}
    for t in tbls:
        for k, v in zip(t["k"].to_pylist(), t["v"].to_pylist()):
            got[k] = v
    want_tbl = dataset.to_table(columns=["k", "v"])
    want = dict(zip(want_tbl["k"].to_pylist(), want_tbl["v"].to_pylist()))
    for p in probes:
        if p in want:
            assert got.get(p) == want[p], p
    # missing keys are simply absent (caller negative-caches)
    assert "kzzz" not in got and "a" not in got


def test_duplicate_keys_across_group_boundary(tmp_path):
    d = str(tmp_path / "dup")
    os.makedirs(d)
    # key 'dup' spans two row groups (group size 3, 5 copies from row 2)
    keys = ["a", "b"] + ["dup"] * 5 + ["z"]
    _write(d, "f.parquet", keys, 3)
    pr = _KeyedPointReader(ds.dataset(d), "k")
    tbls = pr.fetch(["dup"], ["k", "v"])
    rows = [
        (k, v)
        for t in tbls
        for k, v in zip(t["k"].to_pylist(), t["v"].to_pylist())
        if k == "dup"
    ]
    assert len(rows) == 5, rows  # every copy found, none dropped


def test_unsorted_file_falls_back(tmp_path):
    d = str(tmp_path / "unsorted")
    os.makedirs(d)
    _write(d, "f.parquet", ["c", "a", "b"], 2)  # NOT sorted
    pr = _KeyedPointReader(ds.dataset(d), "k")
    assert pr.load() is None
    assert pr.fetch(["a"], ["k", "v"]) is None  # caller uses scan path


def test_budget_fallback(tmp_path):
    d = str(tmp_path / "big")
    os.makedirs(d)
    _write(d, "f.parquet", [f"k{i:05d}" for i in range(100)], 10)
    pr = _KeyedPointReader(ds.dataset(d), "k")
    pr.MAX_ROWS = 10  # force over-budget
    assert pr.load() is None


def test_empty_probe_and_no_hits(kp_dir):
    pr = _KeyedPointReader(ds.dataset(kp_dir), "k")
    assert pr.fetch(["nope"], ["k", "v"]) == []
