"""Youngs-gradient interface normals and Brackbill curvature.

Re-derivation of the reference `get_normal_young` (2dvof.py:283-309): the
interface normal at a cell is the average of F-gradients evaluated at the
four cell corners; the curvature is kappa = -div(normal-hat) by central
differences. The two reference passes (normals, then curvature reading the
completed normal field) become two fused array expressions.

Autodiff note: the degeneracy guard (|mx|,|my| < 1e-10 keeps the raw,
unnormalized components) is implemented with NaN-safe `where` so that
`jax.grad` through the normalization never sees a 0/0.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..grid import Grid2D
from .common import win, embed2

__all__ = [
    "young_normals",
    "curvature_from_normals",
    "young_normals_curvature",
]


def young_normals(g: Grid2D, F):
    """The normalized Youngs interface normals (mx, my), full-shape with
    zero ghosts (the reference never writes the normal fields' ghosts)."""
    ri = (1, g.nx + 1)
    rj = (1, g.ny + 1)

    def f(di, dj):
        return win(F, ri, rj, di, dj)

    inv2dx = 1.0 / (2.0 * g.dx)
    inv2dy = 1.0 / (2.0 * g.dy)

    # Corner gradients (reference 2dvof.py:287-294). Corner k at offsets:
    # 1: (+1,+1)/(+1,0)/(0,+1)/(0,0)  NE; 2: SE; 3: SW; 4: NW.
    mx1 = -inv2dx * (f(1, 1) + f(1, 0) - f(0, 1) - f(0, 0))
    my1 = -inv2dy * (f(1, 1) - f(1, 0) + f(0, 1) - f(0, 0))
    mx2 = -inv2dx * (f(1, 0) + f(1, -1) - f(0, 0) - f(0, -1))
    my2 = -inv2dy * (f(1, 0) - f(1, -1) + f(0, 0) - f(0, -1))
    mx3 = -inv2dx * (f(0, 0) + f(0, -1) - f(-1, 0) - f(-1, -1))
    my3 = -inv2dy * (f(0, 0) - f(0, -1) + f(-1, 0) - f(-1, -1))
    mx4 = -inv2dx * (f(0, 1) + f(0, 0) - f(-1, 1) - f(-1, 0))
    my4 = -inv2dy * (f(0, 1) - f(0, 0) + f(-1, 1) - f(-1, 0))

    mxsum = (mx1 + mx2 + mx3 + mx4) * 0.25
    mysum = (my1 + my2 + my3 + my4) * 0.25

    # Normalize with the 1e-10 degeneracy guard (reference 2dvof.py:300-306).
    degenerate = (jnp.abs(mxsum) < 1e-10) & (jnp.abs(mysum) < 1e-10)
    mag_sq = mxsum * mxsum + mysum * mysum
    safe_mag = jnp.sqrt(jnp.where(degenerate, 1.0, mag_sq))
    mx_int = jnp.where(degenerate, mxsum, mxsum / safe_mag)
    my_int = jnp.where(degenerate, mysum, mysum / safe_mag)

    return embed2(mx_int, 1, 1, 1, 1), embed2(my_int, 1, 1, 1, 1)


def curvature_from_normals(g: Grid2D, mx, my):
    """kappa = -div(m-hat) by central differences (reference
    2dvof.py:307-309); reads the ghost-zero normal field at the domain
    edge, as the reference does (its ghost entries are never written).
    Callable on its own so the distributed solver can re-run it on
    halo-exchanged normals without recomputing the normals themselves."""
    ri = (1, g.nx + 1)
    rj = (1, g.ny + 1)
    inv2dx = 1.0 / (2.0 * g.dx)
    inv2dy = 1.0 / (2.0 * g.dy)
    kap_int = -(
        inv2dx * (win(mx, ri, rj, 1, 0) - win(mx, ri, rj, -1, 0))
        + inv2dy * (win(my, ri, rj, 0, 1) - win(my, ri, rj, 0, -1))
    )
    return embed2(kap_int, 1, 1, 1, 1)


def young_normals_curvature(g: Grid2D, F):
    """Return (mx, my, kappa) full-shape arrays (ghosts zero, as in the
    reference where ghost entries of the normal fields are never
    written)."""
    mx, my = young_normals(g, F)
    return mx, my, curvature_from_normals(g, mx, my)
