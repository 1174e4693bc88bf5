import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """ONE Ray session for the whole pytest run (SURVEY.md §5)."""
    from hackathon_pagerank_ray.state.alloc import tune_allocator
    tune_allocator()   # before ray.init so workers inherit the env vars
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from hackathon_pagerank_ray.stages.relational import tune_shuffle
    tune_shuffle()
    yield
    ray.shutdown()
