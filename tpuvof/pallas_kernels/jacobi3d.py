"""Fused 3-D Jacobi pressure iterations (VMEM-resident).

The XLA 3-D path pays ~70 GB/s effective for every shifted-slice stencil
pass (BASELINE.md analysis), and the Jacobi phase is 10 such passes per
step. This kernel keeps p in VMEM across all iterations: HBM traffic drops
from 10x(read p + write p + read rhs) to one read of (p, rhs) and one write
of p.

Two tricks keep VMEM to three volumes:
- ghost-zeroing instead of edge-zeroed coefficient volumes: the reference
  zeroes the off-diagonal coefficients at the walls (3dvof.py:269-275);
  equivalently, with *constant* off-diagonal coefficients the same update
  results if the iterate's ghost ring is zero (the dead coefficient times a
  zero ghost). The interior iterates are bitwise the products of the same
  numbers; the ghost ring is re-mirrored by the BC application right after
  the projection, so no downstream consumer sees the difference.
- the position-dependent diagonal 1/ap is built arithmetically from iota
  edge indicators rather than five stored volumes.

Fits whole-volume VMEM up to ~144^3; larger grids use the XLA path
(solver3d falls back automatically).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid3D

__all__ = ["jacobi3d_fits_vmem", "pallas_jacobi_3d"]


def jacobi3d_fits_vmem(g: Grid3D) -> bool:
    """Mosaic's planner keeps ~8 padded volumes live (measured: 136.7 MB at
    128^3 against the v5e's 128 MB VMEM); admit grids where that fits."""
    n0 = g.nx + 2
    n1 = ((g.ny + 9) // 8) * 8
    n2 = ((g.nz + 129) // 128) * 128
    return 8 * n0 * n1 * n2 * 4 <= 120 * 2**20


def _kernel(p_ref, rhs_ref, out_ref, *, g: Grid3D, n_iter: int):
    shape = p_ref.shape
    dtype = p_ref.dtype

    # zero the ghost ring of the iterate (stands in for edge-zeroed
    # coefficients; see module docstring)
    gi = lax.broadcasted_iota(jnp.int32, shape, 0)
    gj = lax.broadcasted_iota(jnp.int32, shape, 1)
    gk = lax.broadcasted_iota(jnp.int32, shape, 2)
    ghost = (
        (gi == 0) | (gi == g.nx + 1)
        | (gj == 0) | (gj == g.ny + 1)
        | (gk == 0) | (gk == g.nz + 1)
    )
    out_ref[:] = jnp.where(ghost, 0.0, p_ref[:])

    # diagonal selected from the 8 f64-precomputed edge-class constants,
    # replicating the XLA path's ((((ae+aw)+an)+a_s)+ab)+af accumulation
    # (solver3d._poisson_coeffs_3d) so the cast-to-f32 values are identical
    ishape = (g.nx, g.ny, g.nz)
    dxi2 = np.float64(g.dxi) ** 2
    dyi2 = np.float64(g.dyi) ** 2
    dzi2 = np.float64(g.dzi) ** 2

    def c(ex, ey, ez):
        t = dxi2 if ex else dxi2 + dxi2
        for _ in range(2 - ey):
            t = t + dyi2
        for _ in range(2 - ez):
            t = t + dzi2
        return jnp.asarray(-1.0 / t, dtype)

    def edge_mask(axis, n):
        i = lax.broadcasted_iota(jnp.int32, ishape, axis)
        return (i == 0) | (i == n - 1)

    ex = edge_mask(0, g.nx)
    ey = edge_mask(1, g.ny)
    ez = edge_mask(2, g.nz)
    ap_inv = jnp.where(
        ex,
        jnp.where(ey, jnp.where(ez, c(1, 1, 1), c(1, 1, 0)),
                  jnp.where(ez, c(1, 0, 1), c(1, 0, 0))),
        jnp.where(ey, jnp.where(ez, c(0, 1, 1), c(0, 1, 0)),
                  jnp.where(ez, c(0, 0, 1), c(0, 0, 0))),
    )
    rhs = rhs_ref[:]
    cx = jnp.asarray(dxi2, dtype)
    cy = jnp.asarray(dyi2, dtype)
    cz = jnp.asarray(dzi2, dtype)

    def body(_, carry):
        # subtraction order matches the XLA path: e, w, n, s, f, b
        p_int = (
            rhs
            - cx * out_ref[2:, 1:-1, 1:-1]
            - cx * out_ref[:-2, 1:-1, 1:-1]
            - cy * out_ref[1:-1, 2:, 1:-1]
            - cy * out_ref[1:-1, :-2, 1:-1]
            - cz * out_ref[1:-1, 1:-1, 2:]
            - cz * out_ref[1:-1, 1:-1, :-2]
        ) * ap_inv
        out_ref[1:-1, 1:-1, 1:-1] = p_int
        return carry

    # rolled loop: inside a kernel there is no per-iteration dispatch cost,
    # and the fully unrolled form made Mosaic compile times explode at 128^3
    lax.fori_loop(0, n_iter, body, 0)


def pallas_jacobi_3d(g: Grid3D, n_iter: int, p, rhs_int, interpret: bool = False):
    """p: (nx+2, ny+2, nz+2); rhs_int: interior (nx, ny, nz). Returns the
    iterated p with a zeroed ghost ring (the caller's BC re-mirrors it)."""
    return pl.pallas_call(
        partial(_kernel, g=g, n_iter=n_iter),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # alias p into the output: the kernel's first statement rewrites the
        # whole buffer elementwise, so in-place is safe, and it saves one
        # full volume of VMEM (v5e has 128 MB; 128^3 needs it)
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(p, rhs_int)
