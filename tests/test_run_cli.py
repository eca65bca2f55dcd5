"""The ``ray job submit`` surface (crawler_ray/run.py): crawl, compact and
resume job kinds driven in-process through main() — the documented cfg keys
and summary shapes are contract, so a rename must fail here."""

import json
import os

import pytest

from crawler_ray.run import main


def _write_cfg(tmp_path, name, cfg):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(cfg, f)
    return p


def _run(tmp_path, name, cfg, outdir):
    cfgp = _write_cfg(tmp_path, name, cfg)
    assert main(["--config", cfgp, "--output", outdir]) == 0
    with open(os.path.join(outdir, "result.json")) as f:
        return json.load(f)


def test_crawl_compact_resume_job_chain(ray_session, tmp_path):
    ck = str(tmp_path / "ckpt")
    base = {"kind": "crawl", "n_docs": 40, "budget_per_host": 8,
            "max_rounds": 3, "seen_shards": 2, "checkpoint_dir": ck}

    s1 = _run(tmp_path, "crawl.json", base, str(tmp_path / "out1"))
    assert s1["rounds"] == 3 and s1["pages"] > 0
    assert os.path.isdir(os.path.join(tmp_path, "out1", "documents"))

    s2 = _run(
        tmp_path, "compact.json",
        {"kind": "compact", "checkpoint_dir": ck}, str(tmp_path / "out2"),
    )
    assert s2["compacted_rounds"] == 2 and s2["kept_round"] == 2
    assert os.path.isdir(os.path.join(ck, "base", "seen_delta"))

    s3 = _run(
        tmp_path, "resume.json",
        {**base, "max_rounds": 30, "resume": True}, str(tmp_path / "out3"),
    )
    assert s3["rounds"] > 3  # continued past the compacted prefix
    assert s3["urls_seen"] == s1["urls_seen"] or s3["urls_seen"] > 0


def test_compact_job_with_retention(ray_session, tmp_path):
    import pyarrow as pa

    from crawler_ray.sources import storage

    ck = str(tmp_path / "ck2")
    _run(tmp_path, "c.json",
         {"kind": "crawl", "n_docs": 30, "budget_per_host": 8,
          "max_rounds": 3, "seen_shards": 2, "checkpoint_dir": ck},
         str(tmp_path / "o1"))
    rroot = str(tmp_path / "outputs")
    for r in range(4):
        storage.write_table(pa.table({"x": [r]}),
                            os.path.join(rroot, f"round={r:04d}"))
    s = _run(
        tmp_path, "cc.json",
        {"kind": "compact", "checkpoint_dir": ck,
         "retention_root": rroot, "retention_keep": 1},
        str(tmp_path / "o2"),
    )
    assert s["compacted_rounds"] == 2
    assert s["swept"] == ["0", "1", "2"]
    assert sorted(n for n in os.listdir(rroot)
                  if n.startswith("round=")) == ["round=0003"]


def test_unknown_kind_rejected(ray_session, tmp_path):
    cfgp = _write_cfg(tmp_path, "bad.json", {"kind": "nope"})
    with pytest.raises(SystemExit):
        main(["--config", cfgp, "--output", str(tmp_path / "o")])
