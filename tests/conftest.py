import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # deterministic block order in tests: the streaming executor otherwise
    # emits blocks in completion order, which makes partitioned-order
    # outputs (and their to_pandas views) flaky to compare
    ctx.execution_options.preserve_order = True
    yield
    ray.shutdown()
