"""Geometric multigrid for the edge-zeroed pure-Neumann Poisson operator.

The third rung of the pressure-solver ladder (``Numerics.pressure_solver``):

  'jacobi'  — the reference's fixed-iteration sweeps, no residual check
              (2dvof.py:521-522; bit-parity path)
  'rbsor'   — red-black SOR iterated to an on-device residual tolerance
              (ops/poisson._rbsor / solver3d._rbsor_3d)
  'mg'      — THIS module: V-cycles over a rediscretized grid hierarchy.
              Same contract as 'rbsor' (solve to max|Ap-rhs| <= sor_tol on
              the nullspace-projected system), but the iteration count is
              O(1) in grid size instead of O(n): at 1024^2 a tight solve is
              ~10 V-cycles where RB-SOR needs thousands of sweeps.

Dimension-generic (one implementation serves the 2-D and 3-D drivers):
every level operates on *interior-shaped* arrays, and the per-level
operator reuses the reference's edge-coefficient-zeroing form
(2dvof.py:258-262, here per level) — which makes `jnp.roll` a safe shift
(wrap-around neighbors are multiplied by an exactly-zero coefficient).

Scheme choices (cell-centered MG, Wesseling-standard):
  - smoother: red-black Gauss-Seidel (omega=1), nu=2 pre + 2 post sweeps;
  - restriction: per-axis pairwise mean (block mean — full weighting for
    cell-centered grids, preserves mean-free rhs exactly);
  - prolongation: per-axis linear interpolation with edge clamp
    (bi/tri-linear; the clamp is the homogeneous-Neumann extension);
  - coarsest level: 50 red-black sweeps;
  - coarsening stops when any extent goes odd or would drop below 4, so
    non-power-of-two grids (the reference's 200^2 / 200^3) coarsen as far
    as they can and the residual-driven outer loop absorbs the rest.

Every level's operator is singular with the constant nullspace (row sums
are zero by construction and the operator is symmetric), the block-mean
restriction keeps residuals mean-free, so each coarse problem stays
compatible; the constant component of a coarse correction only shifts p
by a constant, which pressure is defined up to anyway.

Not differentiable (outer `lax.while_loop`), exactly like 'rbsor'; the
differentiable path keeps the fixed-iteration solvers. Serial-only:
`Decomp`/`Decomp3D` reject it (use 'rbsor' there — MG's coarse levels
would be latency-bound on a mesh anyway).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mg_solve", "mg_levels"]


def mg_levels(shape) -> list[tuple[int, ...]]:
    """The coarsening ladder for an interior shape: halve every axis while
    all extents are even and stay >= 4. [(fine), ..., (coarsest)]."""
    shapes = [tuple(int(n) for n in shape)]
    while all(n % 2 == 0 and n // 2 >= 4 for n in shapes[-1]):
        shapes.append(tuple(n // 2 for n in shapes[-1]))
    return shapes


def _coeffs(shape, inv2, dtype):
    """Edge-zeroed Neumann coefficients for one level, interior-shaped.

    Returns ([(a_plus, a_minus) per axis], ap, ap_inv) where a_plus[idx]
    multiplies the +1 neighbor along that axis (zero on the last slice =
    the wall, reference 2dvof.py:258-262) — all as numpy constants baked
    into the trace.
    """
    nd = len(shape)
    total = np.zeros(shape, np.float64)
    axes = []
    for ax, c in enumerate(inv2):
        apl = np.full(shape, c, np.float64)
        ami = np.full(shape, c, np.float64)
        last = [slice(None)] * nd
        first = [slice(None)] * nd
        last[ax] = -1
        first[ax] = 0
        apl[tuple(last)] = 0.0
        ami[tuple(first)] = 0.0
        total += apl + ami
        axes.append((apl.astype(dtype), ami.astype(dtype)))
    ap = (-total).astype(dtype)
    ap_inv = (-1.0 / total).astype(dtype)
    return axes, ap, ap_inv


def _neigh(axes, p, rhs):
    """rhs - sum(neighbor contributions); roll wrap is killed by the zero
    edge coefficients (p[i+1] on an interior array is roll(p, -1))."""
    out = rhs
    for ax, (apl, ami) in enumerate(axes):
        out = out - apl * jnp.roll(p, -1, ax) - ami * jnp.roll(p, 1, ax)
    return out


def _red_mask(shape):
    s = np.zeros(shape, np.int64)
    for ax, n in enumerate(shape):
        idx = np.arange(n).reshape((1,) * ax + (n,) + (1,) * (len(shape) - ax - 1))
        s = s + idx
    return (s % 2) == 0


def _rb_sweep(axes, ap_inv, red, p, rhs):
    """One full red-black Gauss-Seidel sweep (two half sweeps)."""
    for mask in (red, ~red):
        gs = _neigh(axes, p, rhs) * ap_inv
        p = jnp.where(mask, gs, p)
    return p


def _restrict(r):
    """Per-axis pairwise mean (cell-centered full weighting)."""
    for ax in range(r.ndim):
        n = r.shape[ax]
        new_shape = r.shape[:ax] + (n // 2, 2) + r.shape[ax + 1:]
        r = r.reshape(new_shape).mean(axis=ax + 1)
    return r


def _prolong_axis(e, ax):
    lo = jnp.concatenate([jax.lax.slice_in_dim(e, 0, 1, axis=ax),
                          jax.lax.slice_in_dim(e, 0, e.shape[ax] - 1, axis=ax)],
                         axis=ax)
    hi = jnp.concatenate([jax.lax.slice_in_dim(e, 1, e.shape[ax], axis=ax),
                          jax.lax.slice_in_dim(e, e.shape[ax] - 1, e.shape[ax],
                                               axis=ax)],
                         axis=ax)
    a = 0.25 * lo + 0.75 * e  # fine cell 2i   (nearer the i-1 coarse cell)
    b = 0.75 * e + 0.25 * hi  # fine cell 2i+1 (nearer the i+1 coarse cell)
    out = jnp.stack([a, b], axis=ax + 1)
    new_shape = e.shape[:ax] + (2 * e.shape[ax],) + e.shape[ax + 1:]
    return out.reshape(new_shape)


def _prolong(e):
    """Bi/tri-linear cell-centered interpolation (edge-clamped)."""
    for ax in range(e.ndim):
        e = _prolong_axis(e, ax)
    return e


def mg_solve(p, rhs, inv2, tol, max_cycles, nu: int = 2,
             coarse_iters: int = 50):
    """Solve the interior pressure system by residual-driven V-cycles.

    p     — full ghosted array (ghosts untouched, as in the reference);
    rhs   — interior-shaped right-hand side;
    inv2  — per-axis 1/h^2 at the fine level (g.dxi**2, g.dyi**2[, g.dzi**2]);
    tol   — stop when max|Ap - rhs| (nullspace-projected) <= tol;
    max_cycles — V-cycle cap (the while_loop bound).

    Raises ValueError if the grid cannot be coarsened at all (every axis
    odd or < 8) — use pressure_solver='rbsor' there.
    """
    nd = rhs.ndim
    shapes = mg_levels(rhs.shape)
    if len(shapes) < 2:
        raise ValueError(
            f"pressure_solver='mg' needs a coarsenable interior grid "
            f"(all extents even and >= 8); got {rhs.shape} — use 'rbsor'")
    dtype = p.dtype
    levels = []
    for lvl, shape in enumerate(shapes):
        axes, ap, ap_inv = _coeffs(shape,
                                   tuple(c / 4.0**lvl for c in inv2), dtype)
        levels.append((axes, ap, ap_inv, _red_mask(shape)))

    # pure-Neumann compatibility: solve against the projected rhs (pressure
    # is defined up to a constant); same treatment as _rbsor.
    rhs = rhs - jnp.mean(rhs)

    def vcycle(lvl, p_l, rhs_l):
        axes, ap, ap_inv, red = levels[lvl]
        if lvl == len(levels) - 1:
            def body(_, q):
                return _rb_sweep(axes, ap_inv, red, q, rhs_l)
            return jax.lax.fori_loop(0, coarse_iters, body, p_l)
        for _ in range(nu):
            p_l = _rb_sweep(axes, ap_inv, red, p_l, rhs_l)
        r = _neigh(axes, p_l, rhs_l) - ap * p_l  # rhs - A p
        e = vcycle(lvl + 1, jnp.zeros(shapes[lvl + 1], dtype), _restrict(r))
        p_l = p_l + _prolong(e)
        for _ in range(nu):
            p_l = _rb_sweep(axes, ap_inv, red, p_l, rhs_l)
        return p_l

    axes0, ap0, ap_inv0, _ = levels[0]

    def resid(p_l):
        r = _neigh(axes0, p_l, rhs) - ap0 * p_l
        r = r - jnp.mean(r)
        return jnp.max(jnp.abs(r))

    interior = (slice(1, -1),) * nd

    # stall exit: at f32 the achievable residual floor can sit above tol
    # (measured on the v5e: 512^2 developed-flow solves stall near rel
    # 6e-4 of r0); STALL_CYCLES cycles with no new best residual = done.
    # Each V-cycle contracts the residual ~10-50x while converging, so
    # the exit cannot fire during genuine convergence.
    STALL_CYCLES = 4

    def cond(carry):
        p_l, it, r, best, stall = carry
        return (it < max_cycles) & (r > tol) & (stall < STALL_CYCLES)

    def body(carry):
        p_l, it, r, best, stall = carry
        p_l = vcycle(0, p_l, rhs)
        r = resid(p_l)
        improved = r < best
        best = jnp.minimum(best, r)
        stall = jnp.where(improved, 0, stall + 1)
        return p_l, it + 1, r, best, stall

    i0 = jnp.zeros((), jnp.int32)
    p0 = p[interior]
    r0 = resid(p0)
    p_int, *_ = jax.lax.while_loop(cond, body, (p0, i0, r0, r0, i0))
    return p.at[interior].set(p_int)
