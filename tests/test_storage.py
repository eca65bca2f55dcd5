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


def test_retention_sweep_keep_newest():
    import tempfile

    import pyarrow as pa

    from crawler_ray.sources import storage

    with tempfile.TemporaryDirectory() as root:
        t = pa.table({"x": [1]})
        for r in range(6):
            storage.write_table(t, os.path.join(root, f"round={r:04d}"))
        os.makedirs(os.path.join(root, "not_a_partition"))
        swept = storage.retention_sweep(root, keep=2)
        assert swept == ["0", "1", "2", "3"]
        left = sorted(d for d in os.listdir(root) if d.startswith("round="))
        assert left == ["round=0004", "round=0005"]
        # foreign dirs untouched; survivors still readable
        assert os.path.isdir(os.path.join(root, "not_a_partition"))
        assert storage.read_table(os.path.join(root, "round=0005")).num_rows == 1


def test_retention_sweep_min_value_cutoff():
    import tempfile

    import pyarrow as pa

    from crawler_ray.sources import storage

    with tempfile.TemporaryDirectory() as root:
        t = pa.table({"x": [1]})
        for r in [3, 90, 91, 200]:
            storage.write_table(t, os.path.join(root, f"round={r:04d}"))
        swept = storage.retention_sweep(root, min_value=91)
        assert swept == ["3", "90"]
        left = sorted(d for d in os.listdir(root) if d.startswith("round="))
        assert left == ["round=0091", "round=0200"]
        with pytest.raises(ValueError):
            storage.retention_sweep(root)
        with pytest.raises(ValueError):
            storage.retention_sweep(root, keep=1, min_value=2)
        # sweeping an empty/missing root is a no-op
        assert storage.retention_sweep(os.path.join(root, "nope"), keep=1) == []


def test_jsonl_roundtrip_and_autodetect(ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray.sources import storage

    ds = rd.range(50).map_batches(
        lambda df: df.assign(text=df["id"].map(lambda i: f"doc {i}")),
        batch_format="pandas",
    )
    path = str(tmp_path / "part=jsonl")
    storage.write_dataset(ds, path, format="jsonl")
    assert any(n.endswith(".json") or n.endswith(".jsonl")
               for n in os.listdir(path))
    back = storage.read_dataset(path)
    rows = back.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(rows) == 50 and rows.loc[7, "text"] == "doc 7"
    # column pruning on the row-oriented backend
    only = storage.read_dataset(path, columns=["text"])
    assert only.schema().names == ["text"]
    # parquet autodetect unaffected
    ppath = str(tmp_path / "part=pq")
    storage.write_dataset(rd.range(5), ppath, format="parquet")
    assert storage.read_dataset(ppath).count() == 5
