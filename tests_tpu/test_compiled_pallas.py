"""Compiled Pallas kernels vs the XLA path ON THE REAL TPU (VERDICT r1 #4).

tests/test_pallas.py pins the kernel semantics in interpret mode; this
suite asserts the Mosaic-COMPILED kernels agree with the compiled XLA path
at the tolerances BASELINE.md records (f32 FMA/re-association noise), so a
Mosaic regression can never hide behind a healthy interpret-mode run.

Run on the bench machine:  python -m pytest tests_tpu/ -q
(first-ever compiles of these shapes take minutes; cached afterwards).
"""
import numpy as np
import pytest
import jax.numpy as jnp

import tpuvof as tv

pytestmark = pytest.mark.tpu

TOL_2D = {"F": 5e-7, "u": 1e-8, "v": 1e-8, "p": 1e-4}


@pytest.fixture(scope="module")
def state_2d():
    cfg = tv.SimConfig(grid=tv.Grid2D(64, 64))
    state = tv.simulate(cfg, tv.init_state(cfg, ic=1), 50)
    from tpuvof.ops import apply_bc

    u, v, F, p = apply_bc(state.u, state.v, state.F, state.p)
    return cfg, tv.State(F=F, u=u, v=v, p=p)


@pytest.mark.parametrize("parity", [False, True])
def test_compiled_phase_kernels_match_xla(state_2d, parity):
    from tpuvof.solver import _step_pallas, step

    cfg, state = state_2d
    a = step(cfg, state, even_step=parity, lean=True)
    b = _step_pallas(cfg, state, even_step=parity, interpret=False, lean=True)
    for name in ("F", "u", "v", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)),
            atol=TOL_2D[name], err_msg=name)


@pytest.mark.parametrize("parity", [False, True])
def test_compiled_mono_kernel_matches_xla(state_2d, parity):
    from tpuvof.solver import _step_pallas_mono, step

    cfg, state = state_2d
    a = step(cfg, state, even_step=parity, lean=True)
    b = _step_pallas_mono(cfg, state, even_step=parity, interpret=False)
    for name in ("F", "u", "v", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)),
            atol=TOL_2D[name], err_msg=name)


def test_compiled_3d_slab_step_matches_xla():
    from tpuvof.grid import Grid3D
    from tpuvof.solver3d import simulate_3d

    g = Grid3D(32, 32, 32)
    s0 = tv.init_state_3d(g, ic=1)
    a = simulate_3d(g, s0, 12, backend="xla")
    b = simulate_3d(g, s0, 12, backend="pallas")
    tol = {"F": 5e-6, "u": 1e-7, "v": 1e-7, "w": 1e-7, "p": 1e-3}
    for name in ("F", "u", "v", "w", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name), np.float64),
            np.asarray(getattr(a, name), np.float64),
            atol=tol[name], err_msg=name)


def test_compiled_simulate_finite_and_bounded():
    cfg = tv.SimConfig(grid=tv.Grid2D(128, 128),
                       num=tv.Numerics(backend="pallas_mono"))
    s = tv.simulate(cfg, tv.init_state(cfg, ic=1), 200)
    F = np.asarray(s.F)
    assert np.isfinite(F).all()
    assert F.min() >= 0.0 and F.max() <= 1.0


def test_compiled_dist3d_pallas_bitexact_on_1x1_mesh():
    """The distributed wide-halo slab engine compiled on the real chip,
    1x1 mesh: at px=1 the wide halo is zero-shipped and every mask is the
    serial one, so the trajectory must be BIT-identical to the serial
    pallas path (measured 0.0 at 200^3x30; pinned here at 64^3x12)."""
    import jax
    from jax.sharding import Mesh
    from tpuvof.grid import Grid3D
    from tpuvof.parallel import Decomp3D
    from tpuvof.solver3d import simulate_3d

    g = Grid3D(64, 64, 64)
    state = tv.init_state_3d(g, ic=1)
    want = simulate_3d(g, state, 12, backend="pallas")
    dec = Decomp3D(g, Mesh(np.array(jax.devices()[:1]), ("mx",)),
                   backend="pallas")
    assert dec.backend == "pallas"
    got = dec.simulate(state, 12)
    for name in ("F", "u", "v", "w", "p"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name))[1:-1],
            np.asarray(getattr(want, name))[1:-1], err_msg=name)


def test_compiled_dist3d_pencil_bitexact_on_1x1_mesh():
    """The PENCIL pallas engine (slab kernels with global j masks on
    (x,y)-extended resident blocks) compiled on the real chip, forced
    onto a 1x1 two-axis mesh: the y halo is zero-widened, the refresh is
    a no-op and every gj mask reduces to the serial j mask elementwise,
    so the trajectory must be BIT-identical to the serial pallas path
    (the pencil twin of the slab pin above; CPU-mesh f64 parity on real
    2x2/1x2 pencils is pinned by tests/test_parallel_3d.py)."""
    import jax
    from jax.sharding import Mesh
    from tpuvof.grid import Grid3D
    from tpuvof.parallel import Decomp3D
    from tpuvof.solver3d import simulate_3d

    g = Grid3D(64, 64, 64)
    state = tv.init_state_3d(g, ic=1)
    want = simulate_3d(g, state, 12, backend="pallas")
    dec = Decomp3D(g, Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                           ("mx", "my")), backend="pallas", pencil=True)
    assert dec.backend == "pallas" and dec.pencil
    got = dec.simulate(state, 12)
    for name in ("F", "u", "v", "w", "p"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name))[1:-1],
            np.asarray(getattr(want, name))[1:-1], err_msg=name)


def test_compiled_3d_slab_step_matches_xla_128():
    """Flagship-adjacent shape (VERDICT r2 #4): 128^3 exercises the same
    _pick_chunk/VMEM/DMA regime as the 200^3 production workload (whose
    program the benchmarks keep warm); 12 steps cover all sweep phases."""
    from tpuvof.grid import Grid3D
    from tpuvof.solver3d import simulate_3d

    g = Grid3D(128, 128, 128)
    s0 = tv.init_state_3d(g, ic=1)
    a = simulate_3d(g, s0, 12, backend="xla")
    b = simulate_3d(g, s0, 12, backend="pallas")
    tol = {"F": 5e-6, "u": 1e-7, "v": 1e-7, "w": 1e-7, "p": 1e-3}
    for name in ("F", "u", "v", "w", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name), np.float64),
            np.asarray(getattr(a, name), np.float64),
            atol=tol[name], err_msg=name)


def test_compiled_dist2d_pallas_bitexact_on_1x1_mesh():
    """The 2-D resident windowed engine compiled on the real chip, 1x1
    mesh (the 3-D counterpart is pinned above): at px=py=1 the halo
    refresh is a no-op and the windowed kernel's global masks reduce to
    the serial ones, so the trajectory must be BIT-identical to the
    serial canonical path (simulate: entry BC + lean steps)."""
    import jax
    from jax.sharding import Mesh
    from tpuvof.parallel import Decomp

    cfg = tv.SimConfig(grid=tv.Grid2D(64, 64),
                       num=tv.Numerics(backend="pallas_mono"))
    state = tv.init_state(cfg, ic=1)
    want = tv.simulate(cfg, state, 8)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
    dec = Decomp(cfg, mesh)
    assert dec.pallas_shard_supported()
    got = dec.simulate(state, 8)
    for name in ("F", "u", "v", "p"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], err_msg=name)


def test_compiled_dist2d_strips_bitexact_on_1x1_mesh():
    """The STRIP-STREAMING shard engine compiled on the real chip, 1x1
    mesh: the halo refresh is a no-op, the origin scalars are zero and
    the layout equals the serial strips layout, so the trajectory must
    be BIT-identical to the serial strips engine (tx=16 -> 4 strips per
    step through the DMA pipeline on the 64^2 grid)."""
    import jax
    from jax.sharding import Mesh
    from tpuvof.parallel import Decomp
    from tpuvof.solver import _step_pallas_strips
    from tpuvof.ops import apply_bc

    cfg = tv.SimConfig(grid=tv.Grid2D(64, 64),
                       num=tv.Numerics(backend="pallas_mono"))
    state = tv.init_state(cfg, ic=1)
    # serial reference: entry BC + lean strips steps (the canonical
    # simulate semantics), forced to the same tx=16 layout
    u, v, F, p = apply_bc(state.u, state.v, state.F, state.p)
    want = tv.State(F=F, u=u, v=v, p=p)
    for i in range(1, 9):
        want = _step_pallas_strips(cfg, want, even_step=(i % 2 == 0),
                                   interpret=False, tx=16)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
    dec = Decomp(cfg, mesh, engine="strips", tx=16)
    got = dec.simulate(state, 8)
    for name in ("F", "u", "v", "p"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], err_msg=name)


@pytest.mark.parametrize("tile", [16, 32])
def test_compiled_tiled_step_matches_mono(state_2d, tile):
    """The tiled serial engine (solver._step_pallas_tiled) compiled on the
    real chip: every T x T tile keeps only cells >= W from the extended
    block's edge, so the Mosaic-compiled trajectory must agree with the
    whole-field mono kernel to FMA noise (interpret-mode f64 parity is
    1e-13, tests/test_pallas.py). T=16 < W exercises the halo-slicing
    regime a distributed shard cannot reach; 4x4 and 2x2 tile layouts."""
    from tpuvof.solver import _step_pallas_mono, _step_pallas_tiled

    cfg, state = state_2d
    for parity in (False, True):
        a = _step_pallas_mono(cfg, state, parity, interpret=False)
        b = _step_pallas_tiled(cfg, state, parity, tile=tile,
                               interpret=False)
        for name in ("F", "u", "v", "p"):
            np.testing.assert_allclose(
                np.asarray(getattr(b, name)),
                np.asarray(getattr(a, name)),
                atol=TOL_2D[name], err_msg=f"{name} parity={parity}")


def test_compiled_strips_step_matches_mono(state_2d):
    """The strip-streaming engine (solver._step_pallas_strips) compiled
    on the real chip: tx=16 runs 4 strips through the double-buffered
    DMA pipeline on a 64^2 grid (the auto layout would pick a single
    whole-grid strip). Interpret-mode f64 parity with the mono kernel is
    1e-13 (tests/test_pallas.py); compiled agreement is to FMA noise.
    Also pins a 9-step padded-resident trajectory via the public API
    (odd count = remainder branch; unwritten junk margins feed each next
    step's cone margin and must be neutralized by the load sanitizer)."""
    from tpuvof.solver import _step_pallas_mono, _step_pallas_strips

    cfg, state = state_2d
    for parity in (False, True):
        a = _step_pallas_mono(cfg, state, parity, interpret=False)
        b = _step_pallas_strips(cfg, state, parity, interpret=False, tx=16)
        for name in ("F", "u", "v", "p"):
            np.testing.assert_allclose(
                np.asarray(getattr(b, name)),
                np.asarray(getattr(a, name)),
                atol=TOL_2D[name], err_msg=f"{name} parity={parity}")

    cfg_m = cfg.replace(num=tv.Numerics(backend="pallas_mono"))
    cfg_s = cfg.replace(num=tv.Numerics(backend="pallas_strips"))
    want = tv.simulate(cfg_m, state, 9)
    got = tv.simulate(cfg_s, state, 9)
    for name in ("F", "u", "v", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(want, name)),
            atol=TOL_2D[name], err_msg=name)


def test_compiled_mono_kernel_at_vmem_envelope_edge():
    """1024^2 is the largest grid fits_vmem_2d admits (the measured
    113.4 MB envelope edge); the mono kernel must actually run there —
    a VMEM-envelope regression would silently fall back to XLA."""
    from tpuvof.solver import effective_backend

    cfg = tv.SimConfig(grid=tv.Grid2D(1024, 1024),
                       num=tv.Numerics(backend="pallas_mono"))
    assert effective_backend(cfg) == "pallas_mono"
    s = tv.simulate(cfg, tv.init_state(cfg, ic=1), 50)
    F = np.asarray(s.F)
    assert np.isfinite(F).all()
    assert F.min() >= 0.0 and F.max() <= 1.0


def test_compiled_rbsor_2d_hybrid_upgrades_residual():
    """The round-4 numerics-upgrade surface on the real chip (VERDICT r3
    #5): rbsor's on-device while_loop residual stop compiled on TPU,
    hosted in the HYBRID 3-phase pallas step. NOT a hybrid-vs-XLA
    trajectory pin: in f32 the residual-driven solve's TRIP COUNT is
    chaotically sensitive to 1-ulp predictor differences, so the two
    backends' trajectories legitimately diverge within a few steps
    (parity is pinned at f64 1e-12 on CPU, tests/test_mg.py). What must
    hold on-chip: the hybrid program compiles and runs, the physics
    stays finite/bounded/mass-conserving, and the solve actually
    delivers the upgrade — a far lower post-step divergence residual
    than the reference's fixed 10 Jacobi sweeps."""
    import jax

    num = dict(pressure_solver="rbsor", sor_tol=1e-4, sor_max_iter=500)
    cfg_p = tv.SimConfig(grid=tv.Grid2D(64, 64),
                         num=tv.Numerics(backend="pallas", **num))
    cfg_j = tv.SimConfig(grid=tv.Grid2D(64, 64),
                         num=tv.Numerics(backend="pallas"))
    from tpuvof.solver import effective_backend

    assert effective_backend(cfg_p) == "pallas"
    state = tv.init_state(cfg_p, ic=1)
    b = tv.simulate(cfg_p, state, 10)

    F = np.asarray(b.F)
    assert np.isfinite(F).all() and F.min() >= 0.0 and F.max() <= 1.0
    m0 = float(np.asarray(state.F)[1:-1, 1:-1].sum())
    assert abs(F[1:-1, 1:-1].sum() - m0) / m0 < 1e-3

    # the upgrade claim, pinned on the SOLVE's own residual (max|div(u)|
    # of the stepped state cannot move with solver tolerance: it is
    # dominated by the replicated reference quirk of a constant-
    # coefficient solve vs a rho-faced correction at the interface):
    # one compiled projection of a developed-flow rhs must reach its
    # requested tolerance where 10 Jacobi sweeps leave O(r0)
    from tpuvof.ops import apply_bc, mix_properties
    from tpuvof.ops.poisson import (
        _jacobi_sweeps,
        _rbsor,
        divergence_rhs,
        residual,
    )

    g = cfg_p.grid
    s = tv.simulate(cfg_j, state, 100)
    u, v, Fb, p = apply_bc(s.u, s.v, s.F, s.p)
    rho, _ = mix_properties(cfg_p.fluid, Fb)
    rhs = divergence_rhs(g, cfg_p.num, u, v, rho)
    r0 = float(residual(g, jnp.zeros_like(p), rhs))
    tol = 1e-3 * r0
    nm = tv.Numerics(pressure_solver="rbsor", sor_tol=tol,
                     sor_max_iter=200_000)
    p_sor = jax.jit(lambda p0, r: _rbsor(g, nm, p0, r))(
        jnp.zeros_like(p), rhs)
    p_jac = jax.jit(lambda p0, r: _jacobi_sweeps(g, 10, p0, r))(
        jnp.zeros_like(p), rhs)
    r_sor = float(residual(g, p_sor, rhs))
    r_jac = float(residual(g, p_jac, rhs))
    assert np.isfinite(np.asarray(p_sor)).all()
    # reached tol, or stalled at the f32 floor well below jacobi's leavings
    assert r_sor <= max(1.05 * tol, 0.05 * r_jac), (
        f"rbsor residual {r_sor:.3e} vs tol {tol:.3e}, "
        f"jacobi10 leaves {r_jac:.3e}")


def test_compiled_mg_solve_converges():
    """One mg solve-to-tolerance compiled on TPU: the recursive V-cycle
    program (restriction/prolongation ladders) must converge a real
    developed-flow rhs to its requested tolerance on-chip, f32."""
    import jax
    from tpuvof.ops.mg import mg_solve
    from tpuvof.ops.poisson import divergence_rhs, residual

    cfg = tv.SimConfig(grid=tv.Grid2D(128, 128))
    s = tv.simulate(cfg, tv.init_state(cfg, ic=1), 100)
    from tpuvof.ops import apply_bc, mix_properties

    u, v, F, p = apply_bc(s.u, s.v, s.F, s.p)
    rho, _ = mix_properties(cfg.fluid, F)
    g = cfg.grid
    rhs = divergence_rhs(g, cfg.num, u, v, rho)
    r0 = float(residual(g, jnp.zeros_like(p), rhs))
    tol = 1e-3 * r0
    p_sol = jax.jit(lambda p0, r: mg_solve(p0, r, (g.dxi**2, g.dyi**2),
                                           tol, 200))(jnp.zeros_like(p), rhs)
    r = float(residual(g, p_sol, rhs))
    assert np.isfinite(np.asarray(p_sol)).all()
    assert r <= 1.05 * tol, f"mg residual {r:.3e} vs tol {tol:.3e}"


def test_compiled_csf_3d_step_runs_slab_engine():
    """csf=True on the real chip: the fused in-kernel normals+curvature
    slab predictor (widened B+6 halo) must compile, run the pallas
    engine (no fallback warning), stay finite/bounded, and visibly
    differ from the csf=False trajectory."""
    import warnings
    from tpuvof.grid import Grid3D
    from tpuvof.solver3d import simulate_3d

    g = Grid3D(64, 64, 64)
    state = tv.init_state_3d(g, ic=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        on = simulate_3d(g, state, 30, backend="pallas", csf=True)
    off = simulate_3d(g, state, 30, backend="pallas")
    F = np.asarray(on.F)
    assert np.isfinite(F).all() and F.min() >= 0.0 and F.max() <= 1.0
    assert float(jnp.max(jnp.abs(on.u - off.u))) > 0.0
    # and the slab csf step tracks the XLA csf step at f32 tolerances
    want = simulate_3d(g, state, 30, backend="xla", csf=True)
    np.testing.assert_allclose(F, np.asarray(want.F), atol=5e-6)


def test_compiled_streamed_jacobi_bitexact_vs_resident():
    """The HBM-streamed out-of-place Jacobi (the beyond-envelope solve)
    vs the VMEM-resident kernel on the same inputs, compiled: the two
    must agree bitwise at f32 (same constants, same subtraction order)."""
    import jax
    from tpuvof.grid import Grid3D
    from tpuvof.pallas_kernels.jacobi3d import (
        pallas_jacobi_3d,
        streamed_jacobi_3d,
    )
    from tpuvof.solver3d import _pad_jk

    g = Grid3D(64, 64, 64)
    p1, p2 = _pad_jk(g)
    rng = np.random.default_rng(0)
    shape = (g.nx + 2, g.ny + 2 + p1, g.nz + 2 + p2)
    p = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    rhs = np.zeros(shape, np.float32)
    rhs[1:65, 1:65, 1:65] = rng.normal(size=(64, 64, 64))
    rhs = jnp.asarray(rhs)
    a = np.asarray(jax.jit(
        lambda p, r: pallas_jacobi_3d(g, 10, p, r))(p, rhs))
    b = np.asarray(jax.jit(
        lambda p, r: streamed_jacobi_3d(g, 10, p, r))(p, rhs))
    assert np.array_equal(a, b), f"max|diff| {np.abs(a - b).max():.3e}"


def test_compiled_rel_tol_bounded_cost_mg_hybrid():
    """The round-4 bounded-cost production mode compiled on the chip
    (Numerics.sor_tol_rel): mg in the HYBRID pallas step with a RELATIVE
    stopping tolerance — the traced tolerance is a per-solve scalar
    (tol_rel * max|rhs'|) instead of a compile-time constant, which is a
    genuinely different while_loop program than the absolute pins above.
    Must compile, stay finite/bounded/mass-conserving over a short
    horizon, and one isolated compiled solve must actually stop at the
    relative target (not the floor: early exit is the feature)."""
    import jax
    from tpuvof.ops import apply_bc, mix_properties
    from tpuvof.ops.mg import mg_solve
    from tpuvof.ops.poisson import divergence_rhs, residual

    rel = 1e-2
    cfg = tv.SimConfig(grid=tv.Grid2D(64, 64),
                       num=tv.Numerics(backend="pallas",
                                       pressure_solver="mg", sor_tol=0.0,
                                       sor_tol_rel=rel, sor_max_iter=50))
    from tpuvof.solver import effective_backend

    assert effective_backend(cfg) == "pallas"
    state = tv.init_state(cfg, ic=1)
    out = tv.simulate(cfg, state, 12)
    F = np.asarray(out.F)
    assert np.isfinite(F).all() and F.min() >= 0.0 and F.max() <= 1.0
    m0 = float(np.asarray(state.F)[1:-1, 1:-1].sum())
    assert abs(F[1:-1, 1:-1].sum() - m0) / m0 < 1e-3

    # isolated compiled solve on a developed-flow rhs: stops at the
    # relative target, above the floor a run-to-stall solve reaches
    g = cfg.grid
    s = tv.simulate(tv.SimConfig(grid=g), state, 100)
    u, v, Fb, p = apply_bc(s.u, s.v, s.F, s.p)
    rho, _ = mix_properties(cfg.fluid, Fb)
    rhs = divergence_rhs(g, cfg.num, u, v, rho)
    scale = float(jnp.max(jnp.abs(rhs - jnp.mean(rhs))))
    p_sol = jax.jit(lambda p0, r: mg_solve(
        p0, r, (g.dxi**2, g.dyi**2), 0.0, 50, tol_rel=rel))(
        jnp.zeros_like(p), rhs)
    r = float(residual(g, p_sol, rhs))
    assert np.isfinite(np.asarray(p_sol)).all()
    assert r <= rel * scale, f"residual {r:.3e} vs rel target {rel * scale:.3e}"
    assert r > 1e-6 * scale, (
        f"residual {r:.3e} suspiciously deep — the relative stop did not "
        f"fire early (floor run?)")
