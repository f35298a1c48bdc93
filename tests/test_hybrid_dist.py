"""Distributed HYBRID step (VERDICT r4 #1): per-shard Pallas phase
kernels (windowed predict + single FCT sweeps) around the DISTRIBUTED
residual-driven pressure solve (rbsor / parallel-mg), so production
upgrade runs keep kernel speed instead of dropping the whole per-shard
step to XLA (parallel/dist._local_step_hybrid).

Runs on the virtual 8-device CPU mesh (conftest); the phase kernels run
in interpret mode, so these pin the distributed-vs-serial semantics at
f64 — the on-chip throughput claim lives in scripts/tpu_hybrid_dist.py
and bench.py's cups_dist_mg_rel1e2 key.
"""
import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.parallel import Decomp


def make_mesh(px, py):
    devs = np.array(jax.devices()[: px * py]).reshape(px, py)
    return Mesh(devs, ("mx", "my"))


def _f64(state):
    return tv.State(*(a.astype(jnp.float64) for a in state))


def _cfg(solver, n=16):
    return tv.SimConfig(
        grid=tv.Grid2D(n, n),
        num=tv.Numerics(pressure_solver=solver, sor_tol=1e-8,
                        sor_max_iter=2000, backend="pallas"))


@pytest.mark.parametrize("solver", ["rbsor", "mg"])
@pytest.mark.parametrize("px,py,n", [(1, 1, 16), (2, 4, 16), (1, 8, 32),
                                     (2, 2, 16)])
def test_dist_hybrid_matches_serial(solver, px, py, n):
    """The hybrid shard step must match the serial hybrid trajectory at
    f64 on every mesh layout — including 1x1, where the windowed phase
    kernels are the oi=oj=-W special case of the serial kernels and no
    collectives run. (1,8) needs n=32: 16/8 = 2-wide blocks are thinner
    than PHASE_HALO+1 and correctly fall back."""
    cfg = _cfg(solver, n)
    state = _f64(tv.init_state(cfg, ic=1))
    serial = tv.simulate(cfg, state, 7)

    dec = Decomp(cfg, make_mesh(px, py))
    assert dec.hybrid_shard_supported()
    dist = dec.simulate(state, 7)

    I = (slice(1, -1),) * 2
    np.testing.assert_allclose(np.asarray(dist.F)[I],
                               np.asarray(serial.F)[I], atol=1e-12)
    np.testing.assert_allclose(np.asarray(dist.u)[I],
                               np.asarray(serial.u)[I], atol=1e-12)
    np.testing.assert_allclose(np.asarray(dist.v)[I],
                               np.asarray(serial.v)[I], atol=1e-12)
    np.testing.assert_allclose(np.asarray(dist.p)[I],
                               np.asarray(serial.p)[I], atol=1e-7)


def test_hybrid_is_actually_selected():
    """backend='pallas' + upgraded solver + admissible blocks must route
    to _local_step_hybrid — NOT silently to the XLA per-shard step (the
    round-4 behavior this replaces)."""
    cfg = _cfg("mg")
    dec = Decomp(cfg, make_mesh(2, 2))

    def boom(*a, **k):  # pragma: no cover - would mean wrong routing
        raise AssertionError("XLA per-shard step used under the hybrid")

    dec._local_step = boom
    state = _f64(tv.init_state(cfg, ic=1))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning either
        out = dec.simulate(state, 2)
    assert bool(jnp.all(jnp.isfinite(out.F)))


def test_hybrid_thin_blocks_fall_back_to_xla():
    """Local blocks thinner than PHASE_HALO+1 on a sharded axis cannot
    feed the phase widen from one neighbor: warn and keep the XLA step,
    parity intact."""
    cfg = _cfg("rbsor")
    state = _f64(tv.init_state(cfg, ic=1))
    serial = tv.simulate(cfg, state, 4)

    dec = Decomp(cfg, make_mesh(8, 1))  # nxl = 2 < PHASE_HALO + 1
    assert not dec.hybrid_shard_supported()
    with pytest.warns(UserWarning, match="hybrid"):
        step = dec.make_simulate()
    dist = dec.gather_state(step(dec.scatter_state(state), 4))
    I = (slice(1, -1),) * 2
    np.testing.assert_allclose(np.asarray(dist.F)[I],
                               np.asarray(serial.F)[I], atol=1e-12)


def test_engine_force_with_upgraded_solver_raises():
    """engine= is a hard force for a WHOLE-STEP engine; the hybrid runs
    phase kernels instead, so honoring the force is impossible — raise,
    never silently measure the wrong engine."""
    cfg = _cfg("mg")
    with pytest.raises(ValueError, match="HYBRID"):
        Decomp(cfg, make_mesh(2, 2), engine="full").make_simulate()


def test_dist_hybrid_other_ics_and_odd_steps():
    """ic=2/3 exercise interface-heavy curvature paths; odd step counts
    hit the remainder branch of the paired scan."""
    for ic, n_steps in ((2, 5), (3, 3)):
        cfg = _cfg("mg")
        state = _f64(tv.init_state(cfg, ic=ic))
        serial = tv.simulate(cfg, state, n_steps)
        dist = Decomp(cfg, make_mesh(2, 4)).simulate(state, n_steps)
        I = (slice(1, -1),) * 2
        np.testing.assert_allclose(np.asarray(dist.F)[I],
                                   np.asarray(serial.F)[I], atol=1e-12)
        np.testing.assert_allclose(np.asarray(dist.u)[I],
                                   np.asarray(serial.u)[I], atol=1e-12)
