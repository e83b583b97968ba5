"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest run."""

from __future__ import annotations

import pytest

try:  # host tuning (no-op without root); see rayspatial.util.quiet_thp
    from rayspatial.util import quiet_thp

    quiet_thp()
except Exception:
    pass


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
