"""Simulation state pytree and initial conditions.

The reference holds ~30 mutable module-level Taichi fields (2dvof.py:52-93).
In the TPU-native design, the *carried* state is only what the time step
actually propagates — F, u, v, p — as an immutable pytree; everything else
(rho, nu, normals, curvature, FCT scratch) is recomputed inside the fused,
jitted step and never materialized in HBM across steps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .grid import Grid2D, Grid3D
from .config import SimConfig

__all__ = ["State", "State3D", "init_state", "initial_volume_fraction", "find_area"]


class State(NamedTuple):
    """2-D solver state. All arrays have shape (nx+2, ny+2), float32."""

    F: jnp.ndarray  # volume fraction (1 = liquid, 0 = gas)
    u: jnp.ndarray  # x-velocity on left cell faces
    v: jnp.ndarray  # y-velocity on bottom cell faces
    p: jnp.ndarray  # pressure at cell centers


class State3D(NamedTuple):
    """3-D solver state, shape (nx+2, ny+2, nz+2)."""

    F: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    p: jnp.ndarray


def find_area(g: Grid2D, cx: float, cy: float, r: float) -> np.ndarray:
    """Smoothed per-cell liquid fraction of the complement of a circle.

    Vectorized re-derivation of the reference's per-cell corner test
    (2dvof.py:102-134): cells with all four corners outside the circle get
    1.0, fully inside get 0.0, and mixed cells get
    0.5 + 0.5*(dist_center - r)/(sqrt(2)*dx) clamped to [0, 1].
    Computed in float32 on host; returns a (nx+2, ny+2) array.
    """
    dx = np.float32(g.dx)
    xc = g.center_x()[:, None]  # (nx+2, 1)
    yc = g.center_y()[None, :]  # (1, ny+2)
    cx = np.float32(cx)
    cy = np.float32(cy)
    r = np.float32(r)

    def dist(ox, oy):
        return np.sqrt((xc + ox - cx) ** 2 + (yc + oy - cy) ** 2, dtype=np.float32)

    h = dx / np.float32(2.0)
    d_ct = dist(np.float32(0.0), np.float32(0.0))
    d_lu = dist(-h, h)
    d_ld = dist(-h, -h)
    d_ru = dist(h, h)
    d_rd = dist(h, -h)

    all_out = (d_lu > r) & (d_ld > r) & (d_ru > r) & (d_rd > r)
    all_in = (d_lu < r) & (d_ld < r) & (d_ru < r) & (d_rd < r)
    smooth = np.clip(
        np.float32(0.5) + np.float32(0.5) * (d_ct - r) / (np.sqrt(np.float32(2.0)) * dx),
        0.0,
        1.0,
    ).astype(np.float32)
    out = np.where(all_out, np.float32(1.0), np.where(all_in, np.float32(0.0), smooth))
    return out.astype(np.float32)


def initial_volume_fraction(g: Grid2D, ic: int) -> np.ndarray:
    """The three canonical initial conditions (reference 2dvof.py:137-159).

    ic=1 dam break: liquid block x in [0, Lx/3], y in [0, Ly/2] (tested
    against *node* coordinates, matching the reference exactly).
    ic=2 rising bubble: gas circle of radius Lx/12 centered (Lx/2, 2r).
    ic=3 dropping liquid: liquid circle at (Lx/2, Ly - 3r) above a pool
    filling y < 0.37*Ly.
    """
    if ic == 1:
        xn = g.node_x()[:, None]
        yn = g.node_y()[None, :]
        cond = (xn >= 0.0) & (xn <= g.Lx / 3) & (yn >= 0.0) & (yn <= g.Ly / 2)
        return np.where(cond, np.float32(1.0), np.float32(0.0))
    elif ic == 2:
        r = g.Lx / 12
        return find_area(g, g.Lx / 2, 2 * r, r)
    elif ic == 3:
        r = g.Lx / 12
        F = (np.float32(1.0) - find_area(g, g.Lx / 2, g.Ly - 3 * r, r)).astype(
            np.float32
        )
        yn = g.node_y()[None, :]
        return np.where(yn < g.Ly * 0.37, np.float32(1.0), F).astype(np.float32)
    raise ValueError(f"unknown initial condition {ic}; expected 1, 2 or 3")


def init_state(cfg: SimConfig, ic: int = 1) -> State:
    """Allocate the state pytree on device with the chosen initial condition."""
    g = cfg.grid
    F = jnp.asarray(initial_volume_fraction(g, ic), dtype=jnp.float32)
    z = jnp.zeros(g.shape, dtype=jnp.float32)
    return State(F=F, u=z, v=z, p=z)


def find_area_3d(g: Grid3D, cx: float, cy: float, cz: float,
                 r: float) -> np.ndarray:
    """Smoothed per-cell liquid fraction of the complement of a SPHERE —
    the straight 3-D extension of `find_area` (which re-derives the
    reference's corner test, 2dvof.py:102-134; the 3-D reference has no
    counterpart): cells with all eight corners outside get 1.0, fully
    inside 0.0, mixed cells 0.5 + 0.5*(dist_center - r)/(sqrt(3)*dx)
    clamped — the cell-diagonal-normalized smoothing, like 2-D's
    sqrt(2)*dx. float32 on host; (nx+2, ny+2, nz+2)."""
    dx = np.float32(g.dx)
    g2 = g.as_2d()
    xc = g2.center_x()[:, None, None]
    yc = g2.center_y()[None, :, None]
    k = np.arange(g.nz + 2, dtype=np.float32)
    zc = (((k - 1.0) * np.float32(g.dz) + np.float32(g.dz) / 2)
          .astype(np.float32))[None, None, :]
    cx, cy, cz, r = (np.float32(v) for v in (cx, cy, cz, r))

    def dist(ox, oy, oz):
        return np.sqrt((xc + ox - cx) ** 2 + (yc + oy - cy) ** 2
                       + (zc + oz - cz) ** 2, dtype=np.float32)

    h = dx / np.float32(2.0)
    d_ct = dist(np.float32(0.0), np.float32(0.0), np.float32(0.0))
    all_out = None
    all_in = None
    for sx in (-h, h):
        for sy in (-h, h):
            for sz in (-h, h):
                d = dist(sx, sy, sz)
                o, i = d > r, d < r
                all_out = o if all_out is None else (all_out & o)
                all_in = i if all_in is None else (all_in & i)
    smooth = np.clip(
        np.float32(0.5)
        + np.float32(0.5) * (d_ct - r) / (np.sqrt(np.float32(3.0)) * dx),
        0.0, 1.0,
    ).astype(np.float32)
    out = np.where(all_out, np.float32(1.0),
                   np.where(all_in, np.float32(0.0), smooth))
    return out.astype(np.float32)


def initial_volume_fraction_3d(g: Grid3D, ic: int) -> np.ndarray:
    """3-D initial conditions. ic=1 is the reference's dam-break block
    (3dvof.py:127-138, the only IC it implements); ic=2/3 are UPGRADES —
    the 2-D bubble/drop geometries (2dvof.py:137-159) revolved to
    spheres, natural companions of the csf upgrade (a rising bubble /
    falling drop is where surface tension matters)."""
    if ic == 1:
        xn = g.node_x()[:, None, None]
        yn = g.node_y()[None, :, None]
        zn = g.node_z()[None, None, :]
        cond = (
            (xn >= 0.0)
            & (xn <= g.Lx / 3)
            & (yn >= 0.0)
            & (yn <= g.Ly / 2)
            & (zn >= 0.0)
            & (zn <= g.Lz / 3)
        )
        return np.where(cond, np.float32(1.0), np.float32(0.0))
    elif ic == 2:
        # gas bubble of radius Lx/12 centered (Lx/2, 2r, Lz/2) in liquid
        r = g.Lx / 12
        return find_area_3d(g, g.Lx / 2, 2 * r, g.Lz / 2, r)
    elif ic == 3:
        # liquid drop above a pool filling y < 0.37*Ly
        r = g.Lx / 12
        F = (np.float32(1.0)
             - find_area_3d(g, g.Lx / 2, g.Ly - 3 * r, g.Lz / 2, r)
             ).astype(np.float32)
        yn = g.node_y()[None, :, None]
        return np.where(yn < g.Ly * 0.37, np.float32(1.0), F).astype(
            np.float32)
    raise ValueError(f"unknown 3-D initial condition ic={ic} (1, 2, or 3)")


def init_state_3d(g: Grid3D, ic: int = 1) -> State3D:
    F = jnp.asarray(initial_volume_fraction_3d(g, ic), dtype=jnp.float32)
    z = jnp.zeros(g.shape, dtype=jnp.float32)
    return State3D(F=F, u=z, v=z, w=z, p=z)
