import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
            # worker/raylet log lines are forwarded to driver stdout by an
            # async monitor thread; under capsys they land in whatever test
            # is capturing at that moment and corrupt JSON-line CLI asserts
            # (observed as flaky JSONDecodeError in test_cli.py)
            log_to_driver=False,
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Deterministic tiny transcript corpus (FIXTURES.md 'tiny': 100 convs)."""
    from engine.synth import write_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "tiny")
    write_corpus(out, n_convs=100, seed=42, n_shards=4)
    return out


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    from engine.build import build_index

    idx = str(tmp_path_factory.mktemp("index") / "tiny")
    build_index(tiny_corpus, idx, n_buckets=8, n_salts=4, hot_fraction=0.05)
    return idx
