"""3-D surface tension (ops/normals3d.py, the opt-in CSF upgrade).

The reference DISABLES 3-D surface tension — its normals kernel is
commented out (3dvof.py:304-332) and kappa is never written (3dvof.py:607)
— so there is no oracle to pin against. The contract here is instead:

  1. extrusion parity: on a z-invariant volume the 3-D Youngs normals and
     Brackbill curvature reduce EXACTLY to the pinned 2-D op
     (ops/normals.py, itself parity-locked to 2dvof.py:283-309);
  2. axis equivariance: permuting the volume's axes permutes the normals;
  3. degeneracy guard: uniform F keeps raw (zero) components, and the
     NaN-safe normalization stays differentiable (same contract as 2-D);
  4. default-off reference parity: csf=False (the default) and sigma=0
     with csf=True both reproduce the inert-kappa step bit-for-bit;
  5. the enabled step stays finite/bounded, and backend='pallas' falls
     back to XLA with a warning (the slab kernels bake in zero kappa).
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuvof as tv
from tpuvof.grid import Grid2D, Grid3D
from tpuvof.ops.normals import young_normals_curvature
from tpuvof.ops.normals3d import (young_normals_3d,
                                  young_normals_curvature_3d)
from tpuvof.solver3d import init_state_3d, simulate_3d


def _extruded_dam_break(n):
    """(g2, F2, g3, F3): a 2-D dam-break F and its z-invariant extrusion
    (ghost layers included — z-invariance must hold on every k slice)."""
    cfg = tv.SimConfig(grid=tv.Grid2D(n, n))
    # evolve a few steps so the interface has genuine curvature
    state = tv.simulate(cfg, tv.init_state(cfg, ic=1), 40)
    F2 = jnp.asarray(np.asarray(state.F), jnp.float64)
    F3 = jnp.broadcast_to(F2[:, :, None], (n + 2, n + 2, n + 2))
    return cfg.grid, F2, Grid3D(n, n, n), F3


def test_extrusion_parity_with_2d_op():
    g2, F2, g3, F3 = _extruded_dam_break(24)
    mx2, my2, kap2 = young_normals_curvature(g2, F2)
    mx3, my3, mz3, kap3 = young_normals_curvature_3d(g3, F3)

    # mz vanishes EXACTLY (every z-difference subtracts identical values)
    assert float(jnp.max(jnp.abs(mz3))) == 0.0

    # each interior k-slice reproduces the 2-D fields (f64; the 8-corner
    # mean sums the four distinct corner gradients twice, so only
    # summation order differs from the 2-D op)
    for k in (1, 12, 24):
        np.testing.assert_allclose(np.asarray(mx3[:, :, k]),
                                   np.asarray(mx2), atol=1e-13)
        np.testing.assert_allclose(np.asarray(my3[:, :, k]),
                                   np.asarray(my2), atol=1e-13)
        np.testing.assert_allclose(np.asarray(kap3[:, :, k]),
                                   np.asarray(kap2), atol=1e-10)

    # ghost layers are never written (zero ghosts, the 2-D convention)
    for a in (mx3, my3, mz3, kap3):
        arr = np.asarray(a)
        assert np.all(arr[0] == 0) and np.all(arr[-1] == 0)
        assert np.all(arr[:, 0] == 0) and np.all(arr[:, -1] == 0)
        assert np.all(arr[:, :, 0] == 0) and np.all(arr[:, :, -1] == 0)


def test_axis_equivariance():
    rng = np.random.default_rng(7)
    n = 12
    g = Grid3D(n, n, n)
    F = jnp.asarray(rng.random((n + 2, n + 2, n + 2)))
    mx, my, mz, kap = young_normals_curvature_3d(g, F)
    # permute x<->z: normals permute components, curvature is invariant
    Fp = jnp.transpose(F, (2, 1, 0))
    pmx, pmy, pmz, pkap = young_normals_curvature_3d(g, Fp)
    np.testing.assert_allclose(np.asarray(pmx),
                               np.asarray(jnp.transpose(mz, (2, 1, 0))),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pmy),
                               np.asarray(jnp.transpose(my, (2, 1, 0))),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pmz),
                               np.asarray(jnp.transpose(mx, (2, 1, 0))),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pkap),
                               np.asarray(jnp.transpose(kap, (2, 1, 0))),
                               atol=1e-10)


def test_degeneracy_guard_and_grad_safety():
    n = 8
    g = Grid3D(n, n, n)
    F = jnp.ones((n + 2, n + 2, n + 2))  # uniform: all gradients zero
    mx, my, mz, kap = young_normals_curvature_3d(g, F)
    for a in (mx, my, mz, kap):
        assert float(jnp.max(jnp.abs(a))) == 0.0

    # NaN-safe normalization: grad through a degenerate field is finite
    # (the 2-D op's autodiff contract, ops/normals.py docstring)
    grad = jax.grad(lambda f: jnp.sum(young_normals_3d(g, f)[0] ** 2))(F)
    assert bool(jnp.all(jnp.isfinite(grad)))


def test_sigma_zero_bit_parity_and_default_off():
    n = 12
    g = Grid3D(n, n, n)
    state = init_state_3d(g, ic=1)
    base = simulate_3d(g, state, 4)
    # default csf=False is the same call signature as before the upgrade
    off = simulate_3d(g, state, 4, csf=False)
    for a, b in zip(base, off):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0
    # sigma=0 makes the CSF force identically zero -> bit parity
    zero_sigma = simulate_3d(g, state, 4, fl=tv.Fluid(sigma=0.0), csf=True)
    base0 = simulate_3d(g, state, 4, fl=tv.Fluid(sigma=0.0))
    for a, b in zip(zero_sigma, base0):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_csf_step_bounded_and_distinct():
    n = 16
    g = Grid3D(n, n, n)
    state = init_state_3d(g, ic=1)
    on = simulate_3d(g, state, 6, csf=True)
    off = simulate_3d(g, state, 6)
    F = np.asarray(on.F)
    assert np.all(np.isfinite(F))
    assert F.min() >= 0.0 and F.max() <= 1.0
    # mass is conserved by the FCT advection regardless of the momentum
    # source terms
    assert abs(F[1:-1, 1:-1, 1:-1].sum()
               - np.asarray(off.F)[1:-1, 1:-1, 1:-1].sum()) < 1e-8
    # and the force actually does something (default sigma=0.007)
    assert float(jnp.max(jnp.abs(on.u - off.u))) > 0.0


def test_pallas_backend_falls_back_with_warning():
    n = 16
    g = Grid3D(n, n, n)
    state = init_state_3d(g, ic=1)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = simulate_3d(g, state, 3, backend="pallas", csf=True)
    assert any("csf=True" in str(w.message) for w in rec)
    want = simulate_3d(g, state, 3, csf=True)
    for a, b in zip(got, want):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_cli_rejects_csf_outside_3d(capsys):
    from tpuvof.cli import main

    assert main(["--csf", "--nx", "16", "--steps", "1",
                 "--no-frames"]) == 2
    assert "--three-d" in capsys.readouterr().err
