"""Shared fixtures: one Ray session per pytest run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # GRAFT_ORACLE_SF lets the end-of-round sweep re-run the full oracle
    # suite at a bigger scale (e.g. /root/testdata/sf0.01) without code
    # changes; default stays the fast sf0.001.
    import os

    return os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
