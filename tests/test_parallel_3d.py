"""x-decomposed 3-D solver vs the serial path at f64 (VERDICT r1 #7).

Runs on the virtual 8-device CPU mesh (tests/conftest.py). The distributed
trajectory must match the serial solver to re-association noise: same
grid, same schedule, halo exchanges standing in for the serial array's
contiguity.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.solver3d import simulate_3d
from tpuvof.parallel import Decomp3D

N = 16


def make_mesh_1d(px):
    devs = jax.devices()[:px]
    return Mesh(np.array(devs), ("mx",))


def _f64(state):
    return tv.State3D(*(jnp.asarray(np.asarray(a), jnp.float64) for a in state))


@pytest.mark.parametrize("px", [2, 4, 8])
def test_distributed_3d_matches_serial(px):
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 5  # covers phases 1, 2, 0, 1, 2 (incl. the x-sweep first/last)
    want = simulate_3d(g, state, n_steps)
    dec = Decomp3D(g, make_mesh_1d(px))
    got = dec.simulate(state, n_steps)
    np.testing.assert_allclose(np.asarray(got.F)[1:-1], np.asarray(want.F)[1:-1],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.u)[1:-1], np.asarray(want.u)[1:-1],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.v)[1:-1], np.asarray(want.v)[1:-1],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.w)[1:-1], np.asarray(want.w)[1:-1],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.p)[1:-1], np.asarray(want.p)[1:-1],
                               atol=1e-8)


def test_distributed_3d_longer_run_physics():
    g = Grid3D(N, N, N)
    state = tv.init_state_3d(g, ic=1)
    dec = Decomp3D(g, make_mesh_1d(4))
    out = dec.simulate(state, 12)
    F = np.asarray(out.F)
    m0 = float(np.asarray(state.F)[1:-1, 1:-1, 1:-1].sum())
    assert np.isfinite(F).all()
    assert F.min() >= 0.0 and F.max() <= 1.0
    assert abs(F[1:-1, 1:-1, 1:-1].sum() - m0) / m0 < 1e-3


def test_decomp3d_rejects_bad_mesh():
    g = Grid3D(10, 10, 10)
    with pytest.raises(ValueError, match="divisible"):
        Decomp3D(g, make_mesh_1d(4))


def test_distributed_3d_pallas_engine_matches_serial():
    """The wide-halo per-shard slab-kernel engine (backend='pallas') vs the
    serial XLA solver, f64 interpret mode. n_jacobi=2 keeps the dependency
    cone W (n_jacobi+4, chunk-rounded) within the 16-plane shards of a
    32^3 / px=2 run;
    4 steps rotate through all three phases, so every sweep axis serves as
    the mirror_out last sweep at least once."""
    g = Grid3D(32, 32, 32)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4
    want = simulate_3d(g, state, n_steps, n_jacobi=2)
    dec = Decomp3D(g, make_mesh_1d(2), n_jacobi=2, backend="pallas")
    assert dec.backend == "pallas"  # supported at this geometry
    got = dec.simulate(state, n_steps)
    np.testing.assert_allclose(np.asarray(got.F)[1:-1],
                               np.asarray(want.F)[1:-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.u)[1:-1],
                               np.asarray(want.u)[1:-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.v)[1:-1],
                               np.asarray(want.v)[1:-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.w)[1:-1],
                               np.asarray(want.w)[1:-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.p)[1:-1],
                               np.asarray(want.p)[1:-1], atol=1e-8)


def test_distributed_3d_pallas_falls_back_when_shards_too_thin():
    g = Grid3D(32, 32, 32)
    with pytest.warns(UserWarning, match="pallas"):
        dec = Decomp3D(g, make_mesh_1d(8), backend="pallas")
    assert dec.backend == "xla"


def test_distributed_3d_pallas_falls_back_on_odd_shards():
    # odd nx/px can never satisfy the slab-chunk alignment; must warn and
    # fall back (a W-rounding loop over an odd residue would never exit)
    g = Grid3D(24, 24, 24)
    with pytest.warns(UserWarning, match="pallas"):
        dec = Decomp3D(g, make_mesh_1d(8), backend="pallas")
    assert dec.backend == "xla"


def make_mesh_2d(px, py):
    devs = np.array(jax.devices()[: px * py]).reshape(px, py)
    return Mesh(devs, ("mx", "my"))


@pytest.mark.parametrize("px,py,n_steps", [(2, 2, 5), (2, 4, 4), (4, 2, 3),
                                           (1, 2, 4)])
def test_distributed_3d_two_axis_matches_serial(px, py, n_steps):
    """(x, y)-pencil decomposition (2-axis mesh, XLA engine): the masked
    global-index sweeps (ops/fct3d.sweep_masked_2axis), two-stage corner
    exchanges, and the v_lo=1 predictor faces must reproduce the serial
    trajectory like the x-slab engine does. Step counts cover all three
    istep%3 phases; (1,2) exercises the y-only degenerate mesh."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    want = simulate_3d(g, state, n_steps)
    dec = Decomp3D(g, make_mesh_2d(px, py))
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=f"{name} {px}x{py}")


@pytest.mark.parametrize("px,py", [(2, 2), (1, 2), (2, 1)])
def test_distributed_3d_pencil_pallas_matches_serial(px, py):
    """The PENCIL pallas engine ((x,y)-decomposed resident wide-halo
    blocks through the slab kernels with global j masks) vs the serial
    XLA solver, f64 interpret mode. n_jacobi=2 keeps both cones within
    the 16-wide shards; 4 steps rotate through all three sweep phases.
    (1,2) is the y-only decomposition (x refresh a no-op); (2,1) is the
    forced-pencil degenerate mesh (pencil=True, y refresh a no-op) —
    the mode the compiled TPU bit-exactness pin runs."""
    g = Grid3D(32, 32, 32)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4
    want = simulate_3d(g, state, n_steps, n_jacobi=2)
    dec = Decomp3D(g, make_mesh_2d(px, py), n_jacobi=2, backend="pallas",
                   pencil=True)
    assert dec.backend == "pallas" and dec.pencil
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=f"{name} {px}x{py}")


def test_distributed_3d_pencil_from_non_bc_consistent_state():
    """Both pallas drivers BC once at entry (CLAUDE.md invariant): a
    state whose ghost planes are NOT mirror-consistent (painted/
    hand-built) must track the serial PALLAS path — the canonical ICs
    pass trivially because their ghosts equal their mirrors. (The XLA
    oracle is wrong here by design: the reference's step order runs the
    predictor on the RAW entry ghosts before its first set_BC, so from
    an inconsistent entry the XLA and pallas families legitimately
    differ on step 1; from the BC'd state they are pinned equal
    everywhere else in this file.) 2-D twin:
    tests/test_parallel.py::test_distributed_matches_serial_from_non_bc_consistent_state."""
    g = Grid3D(32, 32, 32)
    s = _f64(tv.init_state_3d(g, ic=1))
    F = s.F.at[0, :, :].add(0.01).at[:, -1, :].add(-0.02)
    u = s.u.at[:, 0, :].add(1e-3)
    s0 = tv.State3D(F=F, u=u, v=s.v, w=s.w, p=s.p)
    n_steps = 3
    want = simulate_3d(g, s0, n_steps, n_jacobi=2, backend="pallas")
    dec = Decomp3D(g, make_mesh_2d(2, 2), n_jacobi=2, backend="pallas")
    assert dec.pencil
    got = dec.simulate(s0, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=name)


def test_distributed_3d_pencil_pallas_minimal_shards_pad_alias():
    """Adversarial pencil geometry: ny/py == Wy+1 exactly (the minimum
    the admission check allows), where the bottom shard's sublane-pad
    rows alias global j == ny+1 — the aliasing that would let the
    mirror_out y-mirror write junk into the persistent F pad without
    _mirror_jk's local row bound. Parity vs serial must still hold."""
    g = Grid3D(16, 14, 16, Ly=0.1 * 14 / 16)  # cubic cells (validate())
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4
    want = simulate_3d(g, state, n_steps, n_jacobi=2)
    dec = Decomp3D(g, make_mesh_2d(1, 2), n_jacobi=2, backend="pallas")
    assert dec.backend == "pallas" and dec.pencil and dec.nyl == dec.Wy + 1
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=name)


def test_distributed_3d_rbsor_matches_serial():
    """The 3-D residual-driven RB-SOR (the framework's numerics upgrade
    over the reference's fixed 10 sweeps, 3dvof.py:598-623) must scale
    out like the 2-D one (VERDICT r2 #6): per-half-sweep exchanges +
    psum/pmax residual give every shard the identical trip count, so a
    2x2-pencil XLA-engine run matches serial rbsor at f64 tolerance."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4
    kw = dict(pressure_solver="rbsor", sor_tol=1e-6, sor_max_iter=2000)
    want = simulate_3d(g, state, n_steps, **kw)
    dec = Decomp3D(g, make_mesh_2d(2, 2), **kw)
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=name)


def test_distributed_3d_rbsor_with_pallas_backend_runs_hybrid():
    # since round 5 backend='pallas' + an upgraded solver routes to the
    # HYBRID step (slab kernels around the hosted distributed solve) —
    # no fallback warning (the round-4 behavior was warn + XLA engine);
    # trajectory parity is pinned by tests/test_hybrid_dist3d.py
    import warnings

    g = Grid3D(32, 32, 32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dec = Decomp3D(g, make_mesh_1d(2), backend="pallas",
                       pressure_solver="rbsor")
    assert dec.backend == "pallas" and dec.hybrid


def test_distributed_3d_pencil_pallas_falls_back_when_shards_thin():
    # ny/py = 8 < Wy+1 = 15 at the default n_jacobi: each y halo would
    # need columns from more than one neighbor — must warn and fall back
    g = Grid3D(32, 32, 32)
    with pytest.warns(UserWarning, match="ny/py"):
        dec = Decomp3D(g, make_mesh_2d(2, 4), backend="pallas")
    assert dec.backend == "xla" and not dec.pencil


@pytest.mark.parametrize("seed", [0, 1])
def test_distributed_3d_pencil_fuzz(seed):
    """Randomized-state fuzz of the pencil engine vs the serial pallas
    path (both BC once at entry), f64 interpret on a 2x2 mesh: random
    fields leave no structure for a mask/halo/corner bug to hide behind
    (the pencil twin of tests/test_3d.py::test_pallas_3d_step_fuzz);
    3 steps cover all sweep phases."""
    from test_3d import _random_3d_state

    g = Grid3D(32, 32, 32)
    rng = np.random.default_rng(40 + seed)
    state = tv.State3D(*(jnp.asarray(np.asarray(a), jnp.float64)
                         for a in _random_3d_state(g, rng)))
    n_steps = 3
    want = simulate_3d(g, state, n_steps, n_jacobi=2, backend="pallas")
    dec = Decomp3D(g, make_mesh_2d(2, 2), n_jacobi=2, backend="pallas")
    assert dec.pencil
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=f"{name} seed{seed}")


@pytest.mark.parametrize("px", [2, 4])
def test_distributed_3d_csf_matches_serial(px):
    """Distributed 3-D surface tension (VERDICT r3 #1b): the XLA engine's
    normals/curvature exchanges reproduce the serial csf trajectory at
    f64 — including across shard boundaries, where kappa's +-3 F cone
    spans three shards at px=4 (N/px = 4 owned planes)."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 5
    want = simulate_3d(g, state, n_steps, csf=True)
    dec = Decomp3D(g, make_mesh_1d(px), csf=True)
    got = dec.simulate(state, n_steps)
    # csf really engaged: trajectories must differ from csf=False
    base = simulate_3d(g, state, n_steps)
    assert float(jnp.max(jnp.abs(want.u - base.u))) > 0.0
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1],
            np.asarray(getattr(want, name))[1:-1], atol=atol,
            err_msg=name)


def test_distributed_3d_csf_pallas_matches_serial():
    """csf through the wide-halo slab-kernel engine: the fused in-kernel
    normals (csf-widened cone W = n_jacobi+6, chunk-rounded) vs the
    serial XLA csf path, f64 interpret, 4 steps (all three phases)."""
    g = Grid3D(32, 32, 32)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4
    want = simulate_3d(g, state, n_steps, n_jacobi=2, csf=True)
    dec = Decomp3D(g, make_mesh_1d(2), n_jacobi=2, backend="pallas",
                   csf=True)
    assert dec.backend == "pallas" and dec.W >= 8
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-11), ("u", 1e-11), ("v", 1e-11),
                       ("w", 1e-11), ("p", 1e-7)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1],
            np.asarray(getattr(want, name))[1:-1], atol=atol,
            err_msg=name)


def test_distributed_3d_csf_pencil_matches_serial():
    """csf through the pencil engine (2x2 mesh): in-kernel normals with
    global j masks on the (x,y)-extended resident block."""
    g = Grid3D(32, 32, 32)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 3
    want = simulate_3d(g, state, n_steps, n_jacobi=2, csf=True)
    dec = Decomp3D(g, make_mesh_2d(2, 2), n_jacobi=2, backend="pallas",
                   csf=True)
    assert dec.pencil
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-11), ("u", 1e-11), ("v", 1e-11),
                       ("w", 1e-11), ("p", 1e-7)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=name)


def test_distributed_3d_csf_two_axis_xla_matches_serial():
    """csf on the 2-axis XLA engine: the normals/curvature exchanges run
    in BOTH decomposed axes (x-then-y stages inside _exchange)."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4
    want = simulate_3d(g, state, n_steps, csf=True)
    dec = Decomp3D(g, make_mesh_2d(2, 2), csf=True)
    assert dec.backend == "xla"
    got = dec.simulate(state, n_steps)
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1], atol=atol,
            err_msg=name)
