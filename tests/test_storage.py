"""Resumable storage contract: atomic visibility, skip-on-rerun, roundtrip."""

import os

import pyarrow as pa
import pytest


def test_write_table_atomic_and_roundtrip(tmp_path):
    from crawler_ray.sources import storage

    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    path = str(tmp_path / "tbl")
    storage.write_table(t, path)
    assert storage.read_table(path).equals(t)
    # overwrite replaces wholesale (no stale files bleed through)
    t2 = pa.table({"a": [9], "b": ["q"]})
    storage.write_table(t2, path)
    assert storage.read_table(path).equals(t2)
    # no temp dirs left behind
    assert [d for d in os.listdir(tmp_path) if ".tmp-" in d] == []


def test_write_dataset_atomic_skip_and_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray.sources import storage

    ds = rd.range(100).map_batches(
        lambda t: t.append_column("sq", pa.compute.multiply(t["id"], t["id"])),
        batch_format="pyarrow",
    )
    path = str(tmp_path / "part=0")
    storage.write_dataset(ds, path)
    back = storage.read_dataset(path)
    assert back.count() == 100
    assert sorted(r["sq"] for r in back.take_all()) == sorted(
        i * i for i in range(100)
    )
    # rerun with skip_existing: directory presence == completeness
    mtime = os.path.getmtime(path)
    storage.write_dataset(rd.range(5), path, skip_existing=True)
    assert os.path.getmtime(path) == mtime
    assert storage.read_dataset(path).count() == 100
    # without skip: wholesale replace
    storage.write_dataset(rd.range(5), path)
    assert storage.read_dataset(path).count() == 5
    assert [d for d in os.listdir(tmp_path) if ".tmp-" in d] == []


def test_failed_write_leaves_no_visible_partition(ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray.sources import storage

    def boom(t):
        raise RuntimeError("mid-write crash")

    path = str(tmp_path / "part=1")
    with pytest.raises(Exception):
        storage.write_dataset(
            rd.range(10).map_batches(boom, batch_format="pyarrow"), path
        )
    assert not os.path.isdir(path)  # never partially visible
    assert [d for d in os.listdir(tmp_path) if ".tmp-" in d] == []
