"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def quiet_thp_session():
    """Host tuning for benchmark stability (no-op without root); the
    prior sysfs values are restored at session teardown so the change
    never outlives the test run (ADVICE round 2)."""
    restore = lambda: None  # noqa: E731
    try:
        from rayspatial.util import quiet_thp

        restore = quiet_thp()
    except Exception:
        pass
    yield
    restore()


@pytest.fixture(scope="session")
def ray_session():
    import ray

    from rayspatial.util import enable_hash_shuffle

    enable_hash_shuffle()  # tests must exercise the production shuffle
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()
