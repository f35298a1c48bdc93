"""Compiled-kernel test configuration: run on the REAL platform.

Unlike tests/conftest.py (which forces a CPU mesh), this suite must see the
actual TPU so the Mosaic-compiled kernels — not the interpreter — are under
test. Everything here is skipped automatically when no TPU is present.
"""
import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="requires a real TPU backend")
        for item in items:
            item.add_marker(skip)
