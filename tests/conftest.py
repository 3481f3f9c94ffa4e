"""Pytest session fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_webtext(tmp_path_factory):
    """The unit-tier webtext fixture table, written once per session."""
    from engine.fixtures import write_webtext
    d = tmp_path_factory.mktemp("webtext") / "unit"
    write_webtext(str(d), tier="unit")
    return str(d)


@pytest.fixture(scope="session")
def e2e_webtext(tmp_path_factory):
    from engine.fixtures import write_webtext
    d = tmp_path_factory.mktemp("webtext_e2e") / "e2e"
    write_webtext(str(d), tier="e2e")
    return str(d)
