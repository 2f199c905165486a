from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never per test/module)."""
    import ray

    if not ray.is_initialized():
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
def webpages_small():
    from invertedindexbuilder_ray.corpus import make_webpages

    return make_webpages(100)


@pytest.fixture(scope="session")
def webpages_medium():
    from invertedindexbuilder_ray.corpus import make_webpages

    return make_webpages(1000)
