"""Shared fixtures: one Ray session per pytest session, cached corpora,
cached oracle assessment."""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(__file__))

SMOKE_DIR = "/tmp/luzzu_test_corpora/smoke"
SMOKE_SPEC = dict(n_convs=220, n_giants=1, giant_turns=600, n_files=4)


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
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus_dir() -> str:
    from luzzu_ray.datagen import generate_corpus

    marker = os.path.join(SMOKE_DIR, ".complete-v2")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(SMOKE_DIR, ignore_errors=True)
        generate_corpus(SMOKE_DIR, **SMOKE_SPEC)
        open(marker, "w").close()
    return SMOKE_DIR


@pytest.fixture(scope="session")
def smoke_table(smoke_corpus_dir) -> pa.Table:
    return pa.concat_tables(
        pq.read_table(f)
        for f in sorted(glob.glob(os.path.join(smoke_corpus_dir, "*.parquet")))
    )


@pytest.fixture(scope="session")
def oracle_results(smoke_table):
    import oracle

    return oracle.assess_table(smoke_table)
