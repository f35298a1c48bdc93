"""3-D distributed HYBRID step (VERDICT r4 #1): the slab Pallas kernels
(predict/correct/three FCT sweeps) on a resident extended block sized
WITHOUT the Jacobi erosion, with the DISTRIBUTED residual-driven solve
(rbsor / parallel-mg) hosted as XLA between the kernel phases
(parallel/dist3d._local_step_hybrid).

Runs on the virtual 8-device CPU mesh (conftest); the slab kernels run
in interpret mode, so these pin the distributed-vs-serial semantics at
f64. The on-chip throughput claim lives in scripts/tpu_hybrid_dist.py
and bench.py.
"""
import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.parallel import Decomp3D
from tpuvof.solver3d import simulate_3d

N = 16


def mesh_1d(px):
    return Mesh(np.array(jax.devices()[:px]), ("mx",))


def mesh_2d(px, py):
    return Mesh(np.array(jax.devices()[: px * py]).reshape(px, py),
                ("mx", "my"))


def _f64(state):
    return tv.State3D(*(jnp.asarray(np.asarray(a), jnp.float64)
                        for a in state))


SOLVE = dict(sor_tol=1e-8, sor_max_iter=2000)


def _check(got, want, atol_p=1e-7):
    I = (slice(1, -1),) * 3
    for f in ("F", "u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(got, f))[I],
                                   np.asarray(getattr(want, f))[I],
                                   atol=1e-12, err_msg=f)
    np.testing.assert_allclose(np.asarray(got.p)[I], np.asarray(want.p)[I],
                               atol=atol_p, err_msg="p")


@pytest.mark.parametrize("solver", ["rbsor", "mg"])
@pytest.mark.parametrize("mesh_fn", [lambda: mesh_1d(1), lambda: mesh_1d(2),
                                     lambda: mesh_2d(2, 2)],
                         ids=["1x1-slab", "2-slab", "2x2-pencil"])
def test_dist3d_hybrid_matches_serial(solver, mesh_fn):
    """The 3-D hybrid shard step must match the serial hybrid trajectory
    at f64 on slab AND pencil layouts — including 1x1, where the halo
    refresh is a no-op and the windowed kernels are the gi_base=-W
    special case of the serial ones."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    n_steps = 4  # phases 1, 2, 0, 1 — every sweep order incl. a wrap
    want = simulate_3d(g, state, n_steps, pressure_solver=solver, **SOLVE)
    dec = Decomp3D(g, mesh_fn(), backend="pallas",
                   pressure_solver=solver, **SOLVE)
    assert dec.hybrid and dec.backend == "pallas"
    got = dec.simulate(state, n_steps)
    _check(got, want)


def test_dist3d_hybrid_is_actually_selected():
    """backend='pallas' + upgraded solver must route to
    _local_step_hybrid — NOT warn-and-fall-back to the whole-step XLA
    engine (the round-4 behavior this replaces)."""
    g = Grid3D(N, N, N)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning
        dec = Decomp3D(g, mesh_1d(2), backend="pallas",
                       pressure_solver="mg", **SOLVE)

    def boom(*a, **k):  # pragma: no cover - would mean wrong routing
        raise AssertionError("non-hybrid step used under the hybrid")

    dec._local_step = boom
    dec._local_step_pallas = boom
    out = dec.simulate(_f64(tv.init_state_3d(g, ic=1)), 2)
    assert bool(jnp.all(jnp.isfinite(out.F)))


def test_dist3d_hybrid_cone_excludes_jacobi():
    """The hybrid's resident cone is sized WITHOUT the Jacobi erosion:
    W must be the n_jacobi-free base (4 without csf), not n_jacobi+4."""
    g = Grid3D(32, 32, 32)
    dec = Decomp3D(g, mesh_1d(2), backend="pallas",
                   pressure_solver="rbsor", n_jacobi=10, **SOLVE)
    assert dec.hybrid
    assert dec.W <= 8  # chunk-rounded 4; the jacobi engine needs >= 14

    dec_j = Decomp3D(g, mesh_1d(2), backend="pallas", n_jacobi=10)
    assert dec_j.W >= 14


def test_dist3d_hybrid_thin_blocks_fall_back_to_xla():
    """Shards thinner than W+1 planes cannot feed the halo refresh from
    one neighbor: warn and keep the XLA step, parity intact."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    want = simulate_3d(g, state, 3, pressure_solver="rbsor", **SOLVE)
    with pytest.warns(UserWarning, match="XLA engine"):
        dec = Decomp3D(g, mesh_1d(8), backend="pallas",
                       pressure_solver="rbsor", **SOLVE)  # nxl=2 < W+1
    assert not dec.hybrid and dec.backend == "xla"
    got = dec.simulate(state, 3)
    _check(got, want)


def test_dist3d_hybrid_csf_matches_serial():
    """csf widens the predict cone by 2 (normals+curvature fused in the
    slab predict kernel); the hybrid admission must account for it and
    the trajectory must match the serial csf hybrid."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    want = simulate_3d(g, state, 3, pressure_solver="rbsor", csf=True,
                       **SOLVE)
    dec = Decomp3D(g, mesh_1d(2), backend="pallas",
                   pressure_solver="rbsor", csf=True, **SOLVE)
    assert dec.hybrid
    got = dec.simulate(state, 3)
    _check(got, want)


def test_dist3d_hybrid_chunked_schedule():
    """Chunked calls with istep0 must continue the istep%3 sweep rotation
    bit-for-bit vs one continuous hybrid run."""
    g = Grid3D(N, N, N)
    state = _f64(tv.init_state_3d(g, ic=1))
    dec = Decomp3D(g, mesh_1d(2), backend="pallas",
                   pressure_solver="mg", **SOLVE)
    assert dec.hybrid
    cont = dec.simulate(state, 5)
    a = dec.simulate(state, 2)
    b = dec.simulate(a, 3, istep0=2)
    for f in ("F", "u", "v", "w", "p"):
        np.testing.assert_array_equal(np.asarray(getattr(b, f)),
                                      np.asarray(getattr(cont, f)),
                                      err_msg=f)
