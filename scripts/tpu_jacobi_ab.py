"""A/B: Jacobi rhs streaming vs VMEM residency at 200^3.

The production kernel (pallas_kernels/jacobi3d.py) re-streams rhs from
HBM on EVERY iteration (10 x 43 MB = 430 MB/step) because p + rhs +
Mosaic temporaries did not fit VMEM at B=4 (round-2 stack measurement:
125.3 MB vs the 124 MB cap). tpu_scan_bw.py timed the kernel at 0.837
ms — mostly that rhs traffic. Variants, bit-compared and timed in-scan
(K iterations in one jit, CLAUDE.md timing rules):

  prod    — production kernel (B=4 after the VMEM gate)
  resB2   — rhs VMEM-resident, B=2 (118 MB, fits the 120 MB gate)
  resB4   — rhs VMEM-resident, B=4 under a raised 127 MB limit (the
            round-2 measurement says the stack is 125.3 MB; the v5e has
            128 MB — may fail at remote compile, caught and reported)

All variants must be BIT-identical to prod: same arithmetic order, rhs
values merely come from VMEM instead of a streamed buffer.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvof.grid import Grid3D
from tpuvof.solver3d import _pad_jk
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d, _kernel

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "200"))
K = int(os.environ.get("K", "300"))
NIT = 10
g = Grid3D(N, N, N)
p1, p2 = _pad_jk(g)
shape3 = (N + 2, N + 2 + p1, N + 2 + p2)
n1p, n2p = shape3[1], shape3[2]
VOL = int(np.prod(shape3)) * 4 / 1e9

rng = np.random.default_rng(0)
p0 = jnp.asarray(rng.random(shape3), jnp.float32) * 0.1
rhs_np = rng.random(shape3).astype(np.float32) * 0.1
rhs_np[0] = 0.0
rhs_np[N + 1] = 0.0
rhs_np[:, 0] = 0.0
rhs_np[:, N + 1:] = 0.0
rhs_np[:, :, 0] = 0.0
rhs_np[:, :, N + 1:] = 0.0
rhs = jnp.asarray(rhs_np)


def _kernel_resident(p_ref, rhs_hbm, gib, out_ref, wplane, rhs_vmem, sem,
                     *, g: Grid3D, n_iter: int, B: int, nloc: int):
    """jacobi3d._kernel with rhs held in a VMEM scratch volume: one
    whole-volume DMA up front, zero rhs traffic during the iterations.
    Arithmetic identical to the production kernel (bit-compared below)."""
    gi_base = gib[0]
    n1p, n2p = p_ref.shape[1], p_ref.shape[2]
    dtype = p_ref.dtype
    nc = nloc // B
    bshape = (B, n1p, n2p)

    rhs_load = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(1, nloc)], rhs_vmem.at[pl.ds(0, nloc)], sem.at[0])
    rhs_load.start()

    j = lax.broadcasted_iota(jnp.int32, bshape, 1)
    k = lax.broadcasted_iota(jnp.int32, bshape, 2)
    ghost_jk = (j == 0) | (j >= g.ny + 1) | (k == 0) | (k >= g.nz + 1)
    iota0 = lax.broadcasted_iota(jnp.int32, bshape, 0)

    def ghost_for(i0):
        gi = iota0 + (i0 + gi_base)
        return ghost_jk | (gi <= 0) | (gi >= g.nx + 1)

    def zero_body(c, _):
        i0 = 1 + c * B
        blk = p_ref[pl.ds(i0, B)]
        out_ref[pl.ds(i0, B)] = jnp.where(ghost_for(i0), 0.0, blk)
        return 0

    lax.fori_loop(0, nc, zero_body, 0)
    zp = jnp.zeros((1, n1p, n2p), dtype)
    out_ref[pl.ds(0, 1)] = zp
    out_ref[pl.ds(nloc + 1, 1)] = zp

    dxi2 = np.float64(g.dxi) ** 2
    dyi2 = np.float64(g.dyi) ** 2
    dzi2 = np.float64(g.dzi) ** 2

    def const(ex, ey, ez):
        t = dxi2 if ex else dxi2 + dxi2
        for _ in range(2 - ey):
            t = t + dyi2
        for _ in range(2 - ez):
            t = t + dzi2
        return jnp.asarray(-1.0 / t, dtype)

    cx = jnp.asarray(dxi2, dtype)
    cy = jnp.asarray(dyi2, dtype)
    cz = jnp.asarray(dzi2, dtype)

    ey = (j == 1) | (j == g.ny)
    ez = (k == 1) | (k == g.nz)

    def ap_inv_for(i0):
        gi = lax.broadcasted_iota(jnp.int32, bshape, 0) + (i0 + gi_base)
        ex = (gi == 1) | (gi == g.nx)
        return jnp.where(
            ex,
            jnp.where(ey, jnp.where(ez, const(1, 1, 1), const(1, 1, 0)),
                      jnp.where(ez, const(1, 0, 1), const(1, 0, 0))),
            jnp.where(ey, jnp.where(ez, const(0, 1, 1), const(0, 1, 0)),
                      jnp.where(ez, const(0, 0, 1), const(0, 0, 0))),
        )

    first = lax.broadcasted_iota(jnp.int32, bshape, 0) == 0
    rhs_load.wait()

    def iter_body(it, carry):
        wplane[:] = jnp.zeros((1, n1p, n2p), dtype)

        def chunk_body(c, _):
            i0 = 1 + c * B
            ext = out_ref[pl.ds(i0, B + 1)]
            center = lax.slice_in_dim(ext, 0, B, axis=0)
            east = lax.slice_in_dim(ext, 1, B + 1, axis=0)
            west = jnp.where(first, wplane[:], jnp.roll(center, 1, axis=0))
            wplane[:] = lax.slice_in_dim(ext, B - 1, B, axis=0)
            rhs = rhs_vmem[pl.ds(c * B, B)]
            val = (
                rhs
                - cx * east
                - cx * west
                - cy * jnp.roll(center, -1, axis=1)
                - cy * jnp.roll(center, 1, axis=1)
                - cz * jnp.roll(center, -1, axis=2)
                - cz * jnp.roll(center, 1, axis=2)
            ) * ap_inv_for(i0)
            out_ref[pl.ds(i0, B)] = jnp.where(ghost_for(i0), 0.0, val)
            return 0

        lax.fori_loop(0, nc, chunk_body, 0)
        return carry

    lax.fori_loop(0, n_iter, iter_body, 0)


def resident_call(B, limit_mb):
    def fn(p, r):
        return pl.pallas_call(
            partial(_kernel_resident, g=g, n_iter=NIT, B=B, nloc=N),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, n1p, n2p), p.dtype),
                            pltpu.VMEM((N, n1p, n2p), p.dtype),
                            pltpu.SemaphoreType.DMA((1,))],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=limit_mb * 2**20),
        )(p, r, jnp.zeros((1,), jnp.int32))

    return fn


def prod_fn(p, r):
    return pallas_jacobi_3d(g, NIT, p, r)


def t(name, fn):
    @jax.jit
    def run(p, r):
        def body(c, _):
            return (fn(c[0], c[1]), c[1]), None

        out, _ = lax.scan(body, (p, r), None, length=K)
        return out

    t0 = time.perf_counter()
    out = run(p0, rhs)
    np.asarray(out[0][:1, :1, :8])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(p0, rhs)
        np.asarray(out[0][:1, :1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    ms = best / K * 1e3
    print(f"{name:22s}: {ms:7.3f} ms/iter  (compile {c:.1f}s)", flush=True)
    return ms


ref = np.asarray(jax.jit(prod_fn)(p0, rhs))
prod_ms = t("prod (rhs streamed)", prod_fn)

for name, B, lim in (("resident B=2", 2, 124), ("resident B=4", 4, 127),
                     ("resident B=8", 8, 127)):
    try:
        fn = resident_call(B, lim)
        got = np.asarray(jax.jit(fn)(p0, rhs))
        bd = np.abs(got - ref).max()
        ms = t(f"{name} lim={lim}M", fn)
        print(f"  bit-diff vs prod: {bd:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001 — remote-compile OOM is expected
        print(f"{name}: FAILED: {str(e)[:300]}", flush=True)

t("prod re-run (drift)", prod_fn)
