"""Differentiable CONVERGED projection (VERDICT r4 #4): the implicit-
function custom_vjp for mg/rbsor — the adjoint is one more converged
solve on the nullspace-projected cotangent (A symmetric), upgrading the
reference's hand-written truncated-Jacobi adjoint pattern
(diff_vof_replaced.py:303-330) to the production residual-driven
solvers.

FD validity note: the while_loop trip count can shift under an FD
perturbation; with a TIGHT tolerance the resulting loss kink is at the
solve-tolerance scale, far below the FD epsilon, so central differences
remain valid.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tpuvof as tv
from tpuvof import diff
from tpuvof.ops.mg import mg_solve, mg_solve_implicit

TIGHT = dict(sor_tol=1e-11, sor_max_iter=3000)


def _rand_interior(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float64)


def test_mg_implicit_primal_matches_mg_solve():
    """The wrapper's primal computation IS mg_solve — bit-identical."""
    g = tv.Grid2D(16, 16)
    rhs = _rand_interior((16, 16), 0)
    rhs = rhs - jnp.mean(rhs)
    p0 = jnp.zeros((18, 18), jnp.float64)
    inv2 = (g.dxi**2, g.dyi**2)
    a = mg_solve(p0, rhs, inv2, 1e-10, 500)
    b = mg_solve_implicit(p0, rhs, inv2, 1e-10, 500)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("solver", ["mg", "rbsor"])
def test_implicit_solve_grad_matches_fd(solver):
    """d(loss)/d(rhs) through the converged solve vs central differences
    at f64 and near-machine solve tolerance."""
    g = tv.Grid2D(16, 16)
    inv2 = (g.dxi**2, g.dyi**2)
    w = _rand_interior((18, 18), 1)
    # mean-free interior weight: the solve's output is defined up to a
    # constant (pure-Neumann nullspace) and its constant component is
    # solver-trajectory detail, not an implicit function of rhs — the
    # adjoint contract covers exactly the losses downstream physics can
    # build (p enters only through differences)
    w = w.at[1:-1, 1:-1].add(-jnp.mean(w[1:-1, 1:-1]))
    rhs0 = _rand_interior((16, 16), 2, scale=1e3)

    if solver == "mg":
        def loss(rhs):
            p = mg_solve_implicit(jnp.zeros((18, 18), jnp.float64), rhs,
                                  inv2, 1e-9, 3000)
            return jnp.sum(w * p)
    else:
        from tpuvof.config import Numerics
        from tpuvof.ops.poisson import _rbsor_implicit

        nm = Numerics(pressure_solver="rbsor", **TIGHT)

        def loss(rhs):
            p = _rbsor_implicit(g, nm, jnp.zeros((18, 18), jnp.float64),
                                rhs)
            return jnp.sum(w * p)

    grad = jax.grad(loss)(rhs0)
    assert np.isfinite(np.asarray(grad)).all()
    rng = np.random.default_rng(3)
    eps = 1e-2  # rhs scale is 1e3; solve tol 1e-9 -> FD noise ~1e-7
    for _ in range(4):
        i, j = rng.integers(0, 16, size=2)
        e = jnp.zeros_like(rhs0).at[i, j].set(1.0)
        fd = (loss(rhs0 + eps * e) - loss(rhs0 - eps * e)) / (2 * eps)
        assert np.isclose(float(grad[i, j]), float(fd),
                          rtol=1e-4, atol=1e-8), (
            (i, j), float(grad[i, j]), float(fd))


def test_implicit_warm_start_carries_no_grad():
    """A converged solve does not depend on its warm start (beyond the
    projected-out constant): grad wrt p0 must be exactly zero."""
    g = tv.Grid2D(16, 16)
    rhs = _rand_interior((16, 16), 4, scale=1e3)

    def loss(p0):
        p = mg_solve_implicit(p0, rhs, (g.dxi**2, g.dyi**2), 1e-9, 3000)
        return jnp.sum(p * p)

    gp = jax.grad(loss)(_rand_interior((18, 18), 5))
    np.testing.assert_array_equal(np.asarray(gp), 0.0)


@pytest.mark.parametrize("solver", ["mg", "rbsor"])
def test_diff_rollout_grad_matches_fd(solver):
    """End-to-end: jax.grad through step_diff with the CONVERGED
    projection vs central differences — the mg/rbsor twin of
    test_diff.py::test_grad_matches_finite_differences (which pins the
    unrolled Jacobi)."""
    from test_diff import smooth_f0

    cfg = diff.diff_config(n=10, pressure_solver=solver, **TIGHT)
    Ftarget = diff.diff_target(cfg, 2).astype(jnp.float64)
    F0 = smooth_f0(cfg)
    n_steps = 3

    _, grad = diff.loss_and_grad(cfg, F0, Ftarget, n_steps, True)
    assert np.isfinite(np.asarray(grad)).all()
    rng = np.random.default_rng(1)
    eps = 1e-6
    for _ in range(4):
        i, j = rng.integers(2, cfg.grid.nx, size=2)
        e = jnp.zeros_like(F0).at[i, j].set(1.0)
        lp, _ = diff.loss_and_grad(cfg, F0 + eps * e, Ftarget, n_steps, True)
        lm, _ = diff.loss_and_grad(cfg, F0 - eps * e, Ftarget, n_steps, True)
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(float(grad[i, j]), float(fd),
                          rtol=1e-3, atol=1e-6), (
            (i, j), float(grad[i, j]), float(fd))


def test_diff_mg_grad_at_80():
    """The VERDICT r4 #4 anchor workload: FD gradient check of the mg
    projection at the reference's 80^2 diff grid
    (diff_vof_replaced.py:303-330 upgraded to the converged solver)."""
    from test_diff import smooth_f0

    cfg = diff.diff_config(n=80, pressure_solver="mg", **TIGHT)
    Ftarget = diff.diff_target(cfg, 2).astype(jnp.float64)
    F0 = smooth_f0(cfg)
    n_steps = 2

    _, grad = diff.loss_and_grad(cfg, F0, Ftarget, n_steps, True)
    assert np.isfinite(np.asarray(grad)).all()
    rng = np.random.default_rng(2)
    eps = 1e-6
    for _ in range(3):
        i, j = rng.integers(2, cfg.grid.nx, size=2)
        e = jnp.zeros_like(F0).at[i, j].set(1.0)
        lp, _ = diff.loss_and_grad(cfg, F0 + eps * e, Ftarget, n_steps, True)
        lm, _ = diff.loss_and_grad(cfg, F0 - eps * e, Ftarget, n_steps, True)
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(float(grad[i, j]), float(fd),
                          rtol=1e-3, atol=1e-6), (
            (i, j), float(grad[i, j]), float(fd))


def test_diff_mg_grads_bounded_999_steps():
    """Production config over the reference's full 999-step horizon: mg
    at the bounded-cost relative tolerance stays finite and inside the
    reference's own gradient-gate scale (diff_vof.py:477-482 gates at
    |g| < 5; an exploding adjoint would blow far past it)."""
    cfg = diff.diff_config(n=80, pressure_solver="mg", sor_tol=0.0,
                           sor_tol_rel=1e-3, sor_max_iter=50)
    Ftarget = diff.diff_target(cfg, 2)
    F0 = jnp.zeros(cfg.grid.shape, jnp.float32)
    loss, grad = diff.loss_and_grad(cfg, F0, Ftarget, 999, True)
    g = np.asarray(grad)
    assert np.isfinite(float(loss)) and np.isfinite(g).all()
    assert np.abs(g).max() < 50.0, float(np.abs(g).max())


def test_unrolled_with_converged_solver_raises():
    with pytest.raises(ValueError, match="implicit-function"):
        diff.diff_config(n=10, pressure_solver="mg", adjoint="unrolled")
