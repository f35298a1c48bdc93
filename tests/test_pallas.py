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


def test_fullstep_dma_bit_identical_to_window_mono(setup):
    """pallas_fullstep_dma (the round-5 DMA-overlap experiment, kept as
    a measured-negative record — BASELINE.md) must stay BIT-identical to
    the window-I/O mono kernel: identical arithmetic, only the state
    movement differs, and the per-field BC split it exercises
    (_bc_u/_bc_v/_bc_scal) is shared with the production kernels."""
    from tpuvof.ops import apply_bc
    from tpuvof.pallas_kernels.step_kernels import (
        pallas_fullstep,
        pallas_fullstep_dma,
    )

    cfg, state = setup
    u, v, F, p = apply_bc(state.u, state.v, state.F, state.p)
    a = b = tuple(x.astype(jnp.float64) for x in (F, u, v, p))
    for step_i in range(4):
        even = step_i % 2 == 1
        a = pallas_fullstep(cfg, *a, even, interpret=True)
        b = pallas_fullstep_dma(cfg, *b, even, interpret=True)
    for name, x, y in zip("Fuvp", a, b):
        assert float(np.max(np.abs(np.asarray(x) - np.asarray(y)))) \
            == 0.0, name


def test_tiled_step_matches_mono_every_tile_size():
    """The tiled engine (solver._step_pallas_tiled) must reproduce the
    mono kernel to FMA-contraction noise for every tile layout, both
    parities — including T < W (the halo is sliced from the current
    state, not exchanged, so unlike a distributed shard a tile may be
    narrower than the dependency cone) and the single-tile T=nx case."""
    import jax

    from tpuvof.ops import apply_bc
    from tpuvof.solver import _step_pallas_mono, _step_pallas_tiled

    cfg = tv.SimConfig(grid=tv.Grid2D(64, 64))
    state = tv.simulate(cfg, tv.init_state(cfg, ic=1), 6)
    state = tv.State(*[a.astype(jnp.float64) for a in state])
    u, v, F, p = apply_bc(state.u, state.v, state.F, state.p)
    state = tv.State(F=F, u=u, v=v, p=p)
    for parity in (False, True):
        want = _step_pallas_mono(cfg, state, parity, interpret=True)
        for T in (16, 32, 64, (16, 64), (32, 16)):
            got = _step_pallas_tiled(cfg, state, parity, tile=T,
                                     interpret=True)
            for name, x, y in zip(("F", "u", "v", "p"), got, want):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=1e-13,
                    err_msg=f"{name} T={T} parity={parity}")


def test_tiled_trajectory_via_public_api():
    """backend='pallas_tiled' through simulate(): multi-step trajectory
    (odd step count exercises the remainder branch) matches pallas_mono
    at f64."""
    cfg_m = tv.SimConfig(grid=tv.Grid2D(64, 64),
                         num=tv.Numerics(backend="pallas_mono"))
    cfg_t = cfg_m.replace(num=tv.Numerics(backend="pallas_tiled"))
    s0 = tv.State(*[a.astype(jnp.float64)
                    for a in tv.init_state(cfg_m, ic=1)])
    a = tv.simulate(cfg_m, s0, 21)
    b = tv.simulate(cfg_t, s0, 21)
    for name, x, y in zip(("F", "u", "v", "p"), a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-12, err_msg=name)


def test_tiled_backend_routing():
    """pallas_mono auto-upgrades beyond the VMEM envelope: first to the
    strip-streaming engine (single launch, DMA overlap), then the tiled
    engine, degrading to XLA only when neither layout exists or the
    pressure solver is not the in-kernel Jacobi."""
    from tpuvof.solver import effective_backend

    eff = lambda n, **kw: effective_backend(  # noqa: E731
        tv.SimConfig(grid=tv.Grid2D(n, n),
                     num=tv.Numerics(backend="pallas_mono", **kw)))
    assert eff(512) == "pallas_mono"          # fits VMEM: unchanged
    assert eff(2048) == "pallas_strips"       # beyond envelope: strips
    assert eff(4096) == "pallas_strips"
    # beyond envelope, no power-of-two divisor: strips still applies
    # (only nx % Tx matters; lanes pad to 128)
    assert eff(1160) == "pallas_strips"
    # upgraded solvers beyond the envelope: the tiled HYBRID streams the
    # Pallas phases around the hosted solve (round 5) instead of
    # dropping the whole step to XLA
    assert eff(2048, pressure_solver="rbsor") == "pallas_hybrid_tiled"
    tiled = tv.SimConfig(grid=tv.Grid2D(512, 512),
                         num=tv.Numerics(backend="pallas_tiled"))
    assert effective_backend(tiled) == "pallas_tiled"  # explicit request
    strips = tv.SimConfig(grid=tv.Grid2D(512, 512),
                          num=tv.Numerics(backend="pallas_strips"))
    assert effective_backend(strips) == "pallas_strips"


def test_strips_step_matches_mono():
    """The strip-streaming engine (solver._step_pallas_strips) must
    reproduce the mono kernel at f64 for both parities and several strip
    heights — Tx=16/32 exercise the multi-strip double-buffer/drain
    paths (4 and 2 strips on a 64² grid), the auto layout the
    single-strip case."""
    from tpuvof.ops import apply_bc
    from tpuvof.solver import _step_pallas_mono, _step_pallas_strips

    cfg = tv.SimConfig(grid=tv.Grid2D(64, 64))
    state = tv.simulate(cfg, tv.init_state(cfg, ic=1), 6)
    state = tv.State(*[a.astype(jnp.float64) for a in state])
    u, v, F, p = apply_bc(state.u, state.v, state.F, state.p)
    state = tv.State(F=F, u=u, v=v, p=p)
    for parity in (False, True):
        want = _step_pallas_mono(cfg, state, parity, interpret=True)
        for tx in (16, 32, None):
            got = _step_pallas_strips(cfg, state, parity, interpret=True,
                                      tx=tx)
            for name, x, y in zip(("F", "u", "v", "p"), got, want):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=1e-13,
                    err_msg=f"{name} tx={tx} parity={parity}")


def test_strips_trajectory_via_public_api():
    """backend='pallas_strips' through simulate(): the padded-resident
    scan (junk margins feeding successive steps' cone margins) matches
    pallas_mono at f64 over a multi-step trajectory; the odd step count
    exercises the remainder branch."""
    cfg_m = tv.SimConfig(grid=tv.Grid2D(64, 64),
                         num=tv.Numerics(backend="pallas_mono"))
    cfg_s = cfg_m.replace(num=tv.Numerics(backend="pallas_strips"))
    s0 = tv.State(*[a.astype(jnp.float64)
                    for a in tv.init_state(cfg_m, ic=1)])
    a = tv.simulate(cfg_m, s0, 21)
    b = tv.simulate(cfg_s, s0, 21)
    for name, x, y in zip(("F", "u", "v", "p"), a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-12, err_msg=name)
