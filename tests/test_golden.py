"""The north-star accuracy criterion at its stated horizon (VERDICT r1 #2).

BASELINE.json north star: F L-inf <= 1e-5 vs the reference over 1000
dam-break steps. tests/golden_dambreak_64_1000.npz holds the end state of
the loop-based executable spec (tests/reference_numpy.py, the oracle for
the uninstallable Taichi reference) run once at 64^2 f64 for 1000 steps
(scripts/make_golden_1000.py). Here the framework's own f64 trajectory is
pinned against it far below the 1e-5 criterion, and the f32 production
dtype's drift is recorded against the criterion itself.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import tpuvof as tv

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_dambreak_64_1000.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _run(dtype, n, n_steps):
    cfg = tv.SimConfig(grid=tv.Grid2D(n, n))
    s0 = tv.init_state(cfg, ic=1)
    s0 = tv.State(*(jnp.asarray(x, dtype) for x in s0))
    return tv.simulate(cfg, s0, n_steps)


def test_golden_bias_detector_300_steps_f64(golden):
    """Early-horizon pin: the dam-break flow amplifies rounding noise
    ~x1.02/step (measured by a 1e-16 single-point perturbation experiment),
    and the aggregate XLA-vs-loop-spec re-association noise measures 2.5e-9
    at step 300 vs 3.0e-6 at step 1000. The step-300 bound below (4x the
    measured noise floor) therefore catches any systematic bias above
    ~3e-11/step — three orders tighter than the 1000-step horizon can."""
    n = int(golden["n"])
    state = _run(jnp.float64, n, int(golden["checkpoint"]))
    err_F = np.max(np.abs(np.asarray(state.F) - golden["F300"]))
    err_u = np.max(np.abs(np.asarray(state.u) - golden["u300"]))
    assert err_F <= 1e-8, err_F
    assert err_u <= 1e-8, err_u


def test_golden_1000_steps_f64_north_star(golden):
    """f64 meets the BASELINE.json north-star number (F L-inf <= 1e-5 over
    1000 dam-break steps) at the stated horizon. Measured drift: 2.97e-6 —
    entirely conditioning-amplified rounding (the x1.02/step amplification
    above turns ~1e-16 per-op noise into ~3e-6 by step 1000; the Taichi
    reference's own f32-vs-f64 self-drift would be ~8 orders larger)."""
    n = int(golden["n"])
    state = _run(jnp.float64, n, int(golden["n_steps"]))
    err_F = np.max(np.abs(np.asarray(state.F) - golden["F"]))
    err_u = np.max(np.abs(np.asarray(state.u) - golden["u"]))
    assert err_F <= 1e-5, err_F
    assert err_u <= 1e-5, err_u


def test_golden_1000_steps_f32_drift_recorded(golden):
    """f32 (the production dtype) vs the f64 oracle after 1000 steps:
    measured 1.06e-3. This is the chaos-amplified dtype gap, not framework
    error — no f32 implementation (including the Taichi reference itself)
    can beat it, since f32 per-op noise (~6e-8) times the measured
    x1.02/step amplification exceeds 1e-5 long before step 1000. Pinned as
    a regression bound at 5x the measured value."""
    n = int(golden["n"])
    state = _run(jnp.float32, n, int(golden["n_steps"]))
    err_F = np.max(np.abs(np.asarray(state.F, np.float64) - golden["F"]))
    assert err_F <= 5e-3, err_F


GOLDEN3D = os.path.join(os.path.dirname(__file__),
                        "golden_dambreak3d_32_300.npz")


@pytest.fixture(scope="module")
def golden3d():
    return np.load(GOLDEN3D)


def test_golden_3d_300_steps_f64(golden3d):
    """3-D analogue of the north-star pin: the framework's f64 3-D
    trajectory (XLA path) vs the loop spec at 32^3 over 300 dam-break
    steps, plus the step-100 bias checkpoint (same rationale as the 2-D
    step-300 pin: early horizons catch systematic bias the chaotic end
    state cannot)."""
    from tpuvof.grid import Grid3D
    from tpuvof.solver3d import simulate_3d

    n = int(golden3d["n"])
    g = Grid3D(n, n, n)
    s0 = tv.init_state_3d(g, ic=1)
    s0 = tv.State3D(*(jnp.asarray(x, jnp.float64) for x in s0))
    # checkpoint resumed via istep0 so the istep % 3 rotation continues —
    # chaining simulate_3d WITHOUT istep0 restarts the schedule and
    # follows a different (2.4e-11-off at this horizon) trajectory
    mid = simulate_3d(g, s0, int(golden3d["checkpoint"]))
    assert np.max(np.abs(np.asarray(mid.F) - golden3d["F100"])) <= 1e-9
    assert np.max(np.abs(np.asarray(mid.u) - golden3d["u100"])) <= 1e-9
    end = simulate_3d(g, mid, int(golden3d["n_steps"])
                      - int(golden3d["checkpoint"]),
                      istep0=int(golden3d["checkpoint"]))
    assert np.max(np.abs(np.asarray(end.F) - golden3d["F"])) <= 1e-9
    assert np.max(np.abs(np.asarray(end.u) - golden3d["u"])) <= 1e-9
    # the slab-Pallas path inherits this pin transitively: it matches the
    # XLA path at 1e-10 f64 over multi-step runs (tests/test_3d.py) and
    # bit-exactly when compiled on the TPU (tests_tpu) — a 300-step
    # interpret-mode run here would cost ~25 min for no extra signal
