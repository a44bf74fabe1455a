import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Ray logs a benign "Failed to hash the schemas" warning when deduplicating
# schemas of blob-carrying blocks; silence that one logger.
import logging

logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(
    logging.ERROR
)


FIXDIR = "/tmp/hkfix"


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session per pytest run (driver contract)."""
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def webpages_tiny() -> str:
    from hksketch.pipelines.fixtures import generate_webpages

    return generate_webpages(
        os.path.join(FIXDIR, "webpages_tiny"),
        n_pages=1000,
        n_hosts=200,
        vocab_size=1000,
        seed=42,
        files=2,
    )


@pytest.fixture(scope="session")
def webpages_small() -> str:
    from hksketch.pipelines.fixtures import generate_webpages

    return generate_webpages(
        os.path.join(FIXDIR, "webpages_small"),
        n_pages=20_000,
        n_hosts=2_000,
        vocab_size=5_000,
        seed=42,
        files=8,
    )
