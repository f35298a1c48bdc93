"""Pallas fused kernels must match the XLA path to FMA-rounding noise.

On CPU the kernels run in interpret mode — same trace, same semantics — so
these tests pin the kernel plumbing (specs, shapes, output wiring). Exact
bitwise equality across compilation modes is not achievable (the compiled
XLA path contracts a*b+c into FMAs where the interpreter does not), so the
assertions use 1-ulp-scale tolerances; compiled-mode behavior is exercised
on real TPU by the benchmark drive.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import tpuvof as tv
from tpuvof.solver import _step_pallas, step


@pytest.fixture(scope="module")
def setup():
    cfg = tv.SimConfig(grid=tv.Grid2D(24, 24))
    state = tv.simulate(cfg, tv.init_state(cfg, ic=1), 6)
    return cfg, state


def test_pallas_step_matches_xla(setup):
    cfg, state = setup
    tol = {"F": 5e-7, "u": 1e-9, "v": 1e-9, "p": 2e-4}
    for parity in (False, True):
        a = step(cfg, state, even_step=parity)
        b = _step_pallas(cfg, state, even_step=parity, interpret=True)
        for name, x, y in zip(("F", "u", "v", "p"), a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=tol[name], err_msg=name)


def test_pallas_multi_step_trajectory(setup):
    cfg, state = setup
    a = state
    b = state
    for i in range(1, 6):
        a = step(cfg, a, even_step=(i % 2 == 0))
        b = _step_pallas(cfg, b, even_step=(i % 2 == 0), interpret=True)
    np.testing.assert_allclose(np.asarray(a.F), np.asarray(b.F), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=1e-2)


def test_backend_flag_dispatches(setup):
    cfg, state = setup
    cfg_p = cfg.replace(num=tv.Numerics(backend="pallas"))
    # on CPU this goes through interpret mode automatically
    out = step(cfg_p, state, even_step=False)
    ref = step(cfg, state, even_step=False)
    np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F), atol=5e-7)


def test_fullstep_mono_kernel_matches_lean_step(setup):
    from tpuvof.solver import _step_pallas_mono
    from tpuvof.ops import apply_bc

    cfg, state = setup
    u, v, F, p = apply_bc(state.u, state.v, state.F, state.p)
    state = tv.State(F=F, u=u, v=v, p=p)
    tol = {"F": 5e-7, "u": 1e-9, "v": 1e-9, "p": 2e-4}
    for parity in (False, True):
        a = step(cfg, state, even_step=parity, lean=True)
        b = _step_pallas_mono(cfg, state, even_step=parity, interpret=True)
        for name, x, y in zip(("F", "u", "v", "p"), a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=tol[name], err_msg=name)
