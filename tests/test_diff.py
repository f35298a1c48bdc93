"""Differentiable-path tests: gradient correctness (finite differences),
custom pressure adjoint consistency, and end-to-end optimization progress —
the automated version of the reference's 'loss decreases and the shape
emerges' criterion (SURVEY.md §4, test/diff_fct.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tpuvof as tv
from tpuvof import diff
import tpuvof.models as M


def small_cfg(adjoint="unrolled", n=10, n_jacobi=4):
    return diff.diff_config(n=n, n_jacobi=n_jacobi, adjoint=adjoint)


def smooth_f0(cfg, seed=0):
    """A smooth F0 strictly inside (0,1) and away from upwind/limiter select
    boundaries, so finite differences are valid."""
    g = cfg.grid
    rng = np.random.default_rng(seed)
    base = 0.3 + 0.4 * np.real(
        np.fft.ifft2(
            np.fft.fft2(rng.normal(size=g.shape))
            * np.exp(-0.5 * (np.arange(g.shape[0])[:, None] ** 2 + np.arange(g.shape[1])[None, :] ** 2))
        )
    )
    return jnp.asarray(np.clip(base, 0.2, 0.8), jnp.float64)


def test_grad_matches_finite_differences():
    """Unrolled-mode AD through the scanned step equals the true derivative."""
    cfg = small_cfg()
    Ftarget = diff.diff_target(cfg, 2).astype(jnp.float64)
    F0 = smooth_f0(cfg)
    n_steps = 3

    loss, grad = diff.loss_and_grad(cfg, F0, Ftarget, n_steps, True)
    rng = np.random.default_rng(1)
    eps = 1e-6
    for _ in range(6):
        i, j = rng.integers(2, cfg.grid.nx, size=2)
        e = jnp.zeros_like(F0).at[i, j].set(1.0)
        lp, _ = diff.loss_and_grad(cfg, F0 + eps * e, Ftarget, n_steps, True)
        lm, _ = diff.loss_and_grad(cfg, F0 - eps * e, Ftarget, n_steps, True)
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(float(grad[i, j]), float(fd), rtol=5e-4, atol=1e-7), (
            (i, j), float(grad[i, j]), float(fd)
        )


def test_remat_matches_no_remat():
    cfg = small_cfg()
    Ftarget = diff.diff_target(cfg, 2).astype(jnp.float64)
    F0 = smooth_f0(cfg)
    l1, g1 = diff.loss_and_grad(cfg, F0, Ftarget, 4, True)
    l2, g2 = diff.loss_and_grad(cfg, F0, Ftarget, 4, False)
    assert np.isclose(float(l1), float(l2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-12)


def test_selfadjoint_adjoint_close_to_unrolled():
    """The diff_vof_replaced-style custom adjoint is an approximation (it
    treats the truncated Jacobi solve as converged); its gradient must be
    directionally consistent with the exact unrolled gradient."""
    cfg_u = small_cfg("unrolled", n_jacobi=10)
    cfg_s = small_cfg("selfadjoint", n_jacobi=10)
    Ftarget = diff.diff_target(cfg_u, 2).astype(jnp.float64)
    F0 = smooth_f0(cfg_u)
    _, gu = diff.loss_and_grad(cfg_u, F0, Ftarget, 4, True)
    _, gs = diff.loss_and_grad(cfg_s, F0, Ftarget, 4, True)
    gu = np.asarray(gu).ravel()
    gs = np.asarray(gs).ravel()
    cos = gu @ gs / (np.linalg.norm(gu) * np.linalg.norm(gs) + 1e-30)
    assert cos > 0.99, cos


def test_apply_grad_gate_and_clamp():
    F0 = jnp.asarray([[0.5, 0.9], [0.1, 0.0]])
    grad = jnp.asarray([[10.0, 0.5], [-0.5, -1.0]])
    out = diff.apply_grad(F0, grad, lr=1.0, grad_gate=5.0, interior_only=False)
    out = np.asarray(out)
    assert out[0, 0] == 0.5  # gated: |grad| >= 5 leaves F untouched
    assert out[0, 1] == pytest.approx(0.4)
    assert out[1, 0] == pytest.approx(0.6)
    assert out[1, 1] == pytest.approx(1.0)  # clamped to [0, 1]


def test_optimize_f0_decreases_loss():
    """End-to-end mini version of the diff_vof cycle: loss falls and mass
    moves toward the target."""
    cfg = diff.diff_config(n=16, n_jacobi=4)
    Ftarget = diff.diff_target(cfg, 1)
    opts = diff.DiffOptions(n_steps=10, lr=0.05)
    F0, losses = diff.optimize_f0(cfg, Ftarget, opts=opts, n_epochs=25)
    assert losses[-1] < 0.5 * losses[0], losses[:3] + losses[-3:]
    F0 = np.asarray(F0)
    assert F0.min() >= 0.0 and F0.max() <= 1.0


def test_optimize_advection_f0_decreases_loss():
    """test/diff_fct.py analog: recover a circle target through 20 advected
    steps of the vortex from a uniform F0."""
    case, _, u, v, Ftarget = M.single_vortex(n=24, tmax=2000)
    F0, losses = diff.optimize_advection_f0(
        case, u, v, Ftarget, n_steps=20, n_epochs=40, lr=0.1
    )
    # L1 loss has sign-valued gradients: fixed-lr SGD descends roughly
    # linearly then oscillates around the optimum (bang-bang), mirroring the
    # reference's behavior at lr=0.1 — so assert on the best loss reached
    # and on the final loss being well below the start.
    assert min(losses) < 0.5 * losses[0], (losses[0], min(losses))
    assert losses[-1] < 0.75 * losses[0], (losses[0], losses[-1])
    # the recovered initial condition resembles the (backward-advected)
    # target: gas region appears near the target's gas region
    gas_rec = 1.0 - np.asarray(F0)[1:-1, 1:-1]
    gas_tgt = 1.0 - np.asarray(Ftarget)[1:-1, 1:-1]
    assert gas_rec.sum() > 0.3 * gas_tgt.sum()


def test_paint_blocks():
    g = tv.Grid2D(20, 20)
    t = diff.paint_blocks(g, [(0.5, 0.5), (0.0, 0.0)])
    t = np.asarray(t)
    assert t[10, 10] == 1.0 and t[9, 9] == 1.0
    assert t.sum() == pytest.approx(16 + 4)  # full block + corner-clipped block


def test_rollout_frames_matches_rollout():
    """The viz-only chunked forward (CLI --view-every, VERDICT r2 #8) must
    follow the exact gradient-rollout trajectory: chunking preserves the
    0-based parity schedule, including odd chunk sizes."""
    cfg = small_cfg()
    F0 = smooth_f0(cfg)
    want = diff.rollout(cfg, F0, 7, remat=False).F
    frames = list(diff.rollout_frames(cfg, F0, 7, every=3))
    assert [s for s, _ in frames] == [3, 6, 7]
    np.testing.assert_array_equal(np.asarray(frames[-1][1]),
                                  np.asarray(want))
