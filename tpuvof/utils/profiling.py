"""Tracing / step-timing harness (SURVEY.md §5: the reference has none —
its only instrumentation is print banners).

`trace` wraps a block in a `jax.profiler` trace (viewable in TensorBoard /
xprof); `time_steps` measures honest steady-state wall-clock per step with
compile excluded and host materialization as the fence (the axon tunnel's
`block_until_ready` can return before device completion).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "time_steps"]


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fence(state):
    """Block until device completion by materializing a TINY slice of F:
    it still waits on the whole program (the copy is ordered after it),
    but does not pay the host tunnel for the full field — a full-field
    np.asarray(state.F) added ~8 ms/step of transfer artifact to 3-D
    volumes over the axon relay (CLAUDE.md 'Timing'; same pattern as
    bench.py)."""
    np.asarray(state.F[:1, :1])


def time_steps(simulate, cfg, state, n_steps: int, repeats: int = 3):
    """Returns (best_seconds, cell_updates_per_sec, final_state)."""
    # warmup/compile
    state = simulate(cfg, state, n_steps)
    _fence(state)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = simulate(cfg, state, n_steps)
        _fence(state)
        best = min(best, time.perf_counter() - t0)
    cells = cfg.grid.nx * cfg.grid.ny
    return best, cells * n_steps / best, state
