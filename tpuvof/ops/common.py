"""Shared helpers for the stencil ops.

Every op in this package is a pure function from arrays to arrays: the
reference's in-place Taichi kernels (per-cell `ti.ndrange` loops) become
whole-array shifted-slice expressions that XLA fuses into a handful of HBM
passes. Loop bounds like `ti.ndrange((imin+1, imax+1), (jmin, jmax+1))`
translate to window slices via :func:`win`.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["win", "clamp01", "median3", "interior", "set_interior"]


def win(a, ri, rj, di: int = 0, dj: int = 0):
    """Slice array ``a`` over the index window ``ri x rj`` shifted by (di, dj).

    ``ri = (i0, i1)`` covers reference indices i in [i0, i1) — the direct
    translation of ``ti.ndrange((i0, i1), (j0, j1))`` with a stencil offset.
    """
    (i0, i1) = ri
    (j0, j1) = rj
    return a[i0 + di : i1 + di, j0 + dj : j1 + dj]


def win3(a, ri, rj, rk, di: int = 0, dj: int = 0, dk: int = 0):
    (i0, i1) = ri
    (j0, j1) = rj
    (k0, k1) = rk
    return a[i0 + di : i1 + di, j0 + dj : j1 + dj, k0 + dk : k1 + dk]


def clamp01(x):
    """median(0, 1, x) == clip to [0, 1] (reference `var`, 2dvof.py:192-195).

    Implemented with strict-comparison selects rather than jnp.clip: the
    values are identical, but the VJP differs at the boundaries. jnp.clip's
    max/min give derivative 0.5 at exact ties, which under autodiff halves
    the gradient at every per-step clamp — through T steps that is a 0.5^T
    attenuation that freezes the F0 optimization whenever F sits exactly at
    0 or 1 (its starting state!). Taichi's median-of-selects passes
    derivative 1 at the boundary (diff_vof.py differentiates *through* the
    clamps, SURVEY.md §7 step 3); this form reproduces that.
    """
    return jnp.where(x < 0.0, 0.0, jnp.where(x > 1.0, 1.0, x))


def median3(a, b, c):
    """Median of three, exactly as the reference computes it."""
    return a + b + c - jnp.maximum(a, jnp.maximum(b, c)) - jnp.minimum(
        a, jnp.minimum(b, c)
    )


def interior(a):
    """The non-ghost region of a field array (any rank)."""
    return a[tuple(slice(1, -1) for _ in range(a.ndim))]


def set_interior(a, values):
    """Return a copy of ``a`` with its interior replaced."""
    return a.at[tuple(slice(1, -1) for _ in range(a.ndim))].set(values)
