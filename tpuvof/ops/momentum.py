"""Momentum predictor: explicit Euler with first-order upwind convection,
central viscosity, gravity and Brackbill CSF surface tension.

Re-derivation of the reference `advect_upwind` (2dvof.py:206-233). The
per-cell `if u > 0` upwind selects become `jnp.where` — identical
subgradient semantics under reverse-mode AD (SURVEY.md §7 step 3).

u* is produced on faces i in [imin+1, imax], j in [jmin, jmax]; everywhere
else it is zero, which coincides with the wall no-penetration values the
pressure solve expects (the reference leaves those entries untouched at
their zero initialization — 2dvof.py:208,221).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import Fluid, Numerics
from ..grid import Grid2D
from .common import win

__all__ = ["predict_velocity"]


def predict_velocity(g: Grid2D, fl: Fluid, nm: Numerics, u, v, F, rho, nu, kappa):
    """Return (u_star, v_star)."""
    dt = nm.dt
    dxi, dyi = g.dxi, g.dyi

    # ---------- u* on i in [2, nx], j in [1, ny] ----------
    ri = (2, g.nx + 1)
    rj = (1, g.ny + 1)

    def U(di=0, dj=0):
        return win(u, ri, rj, di, dj)

    def Vv(di=0, dj=0):
        return win(v, ri, rj, di, dj)

    u_c = U()
    v_here = 0.25 * (Vv(-1, 0) + Vv(-1, 1) + Vv(0, 0) + Vv(0, 1))
    dudx = jnp.where(u_c > 0, (u_c - U(-1, 0)) * dxi, (U(1, 0) - u_c) * dxi)
    dudy = jnp.where(v_here > 0, (u_c - U(0, -1)) * dyi, (U(0, 1) - u_c) * dyi)
    kappa_ave = (win(kappa, ri, rj) + win(kappa, ri, rj, -1, 0)) * 0.5
    fx_kappa = -fl.sigma * (win(F, ri, rj) - win(F, ri, rj, -1, 0)) * kappa_ave / g.dx
    nu_c = win(nu, ri, rj)
    u_star_int = u_c + dt * (
        nu_c * (U(-1, 0) - 2.0 * u_c + U(1, 0)) * dxi**2
        + nu_c * (U(0, -1) - 2.0 * u_c + U(0, 1)) * dyi**2
        - u_c * dudx
        - v_here * dudy
        + fl.gx
        + fx_kappa * 2.0 / (win(rho, ri, rj) + win(rho, ri, rj, -1, 0))
    )
    u_star = jnp.zeros_like(u).at[2 : g.nx + 1, 1 : g.ny + 1].set(u_star_int)

    # ---------- v* on i in [1, nx], j in [2, ny] ----------
    si = (1, g.nx + 1)
    sj = (2, g.ny + 1)

    def U2(di=0, dj=0):
        return win(u, si, sj, di, dj)

    def V2(di=0, dj=0):
        return win(v, si, sj, di, dj)

    v_c = V2()
    u_here = 0.25 * (U2(0, -1) + U2(0, 0) + U2(1, -1) + U2(1, 0))
    dvdx = jnp.where(u_here > 0, (v_c - V2(-1, 0)) * dxi, (V2(1, 0) - v_c) * dxi)
    dvdy = jnp.where(v_c > 0, (v_c - V2(0, -1)) * dyi, (V2(0, 1) - v_c) * dyi)
    kappa_ave = (win(kappa, si, sj) + win(kappa, si, sj, 0, -1)) * 0.5
    fy_kappa = -fl.sigma * (win(F, si, sj) - win(F, si, sj, 0, -1)) * kappa_ave / g.dy
    nu_c = win(nu, si, sj)
    v_star_int = v_c + dt * (
        nu_c * (V2(-1, 0) - 2.0 * v_c + V2(1, 0)) * dxi**2
        + nu_c * (V2(0, -1) - 2.0 * v_c + V2(0, 1)) * dyi**2
        - u_here * dvdx
        - v_c * dvdy
        + fl.gy
        + fy_kappa * 2.0 / (win(rho, si, sj) + win(rho, si, sj, 0, -1))
    )
    v_star = jnp.zeros_like(v).at[1 : g.nx + 1, 2 : g.ny + 1].set(v_star_int)
    return u_star, v_star


def correct_velocity(g: Grid2D, nm: Numerics, u_star, v_star, p, rho):
    """Pressure-gradient velocity correction (reference `update_uv`,
    2dvof.py:269-280), keeping the untouched entries of u/v from the caller.

    The reference's in-kernel Courant warning prints become a device-side
    metric computed by the caller (metrics.cfl_numbers).
    """
    dt = nm.dt

    ri = (2, g.nx + 1)
    rj = (1, g.ny + 1)
    r_u = (win(rho, ri, rj) + win(rho, ri, rj, -1, 0)) * 0.5
    u_int = win(u_star, ri, rj) - dt / r_u * (
        win(p, ri, rj) - win(p, ri, rj, -1, 0)
    ) * g.dxi

    si = (1, g.nx + 1)
    sj = (2, g.ny + 1)
    r_v = (win(rho, si, sj) + win(rho, si, sj, 0, -1)) * 0.5
    v_int = win(v_star, si, sj) - dt / r_v * (
        win(p, si, sj) - win(p, si, sj, 0, -1)
    ) * g.dyi

    return u_int, v_int


def update_velocity(g: Grid2D, nm: Numerics, u_prev, v_prev, u_star, v_star, p, rho):
    """Full-array velocity update: corrected interior ranges written over the
    previous velocity fields (wall-face entries keep their old values until
    the subsequent BC application, exactly like the reference)."""
    u_int, v_int = correct_velocity(g, nm, u_star, v_star, p, rho)
    u = u_prev.at[2 : g.nx + 1, 1 : g.ny + 1].set(u_int)
    v = v_prev.at[1 : g.nx + 1, 2 : g.ny + 1].set(v_int)
    return u, v
