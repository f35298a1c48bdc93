"""Bandwidth vs compute attribution for the 3-D slab-streaming kernels.

BASELINE.md records the streaming kernels at ~330 GB/s effective (~40% of
the v5e's 819 GB/s) and frames the step as stream-bandwidth-bound. This
probe separates the two possible causes IN ONE PROCESS (CLAUDE.md timing
rules): a family of kernels with the correct3d kernel's exact DMA
structure (5 volume reads, 3 volume writes, double-buffered B-plane
slabs) and increasing compute realism:

  copy   — pass-through adds only: the slab scheme's pure DMA ceiling
  masks  — + the 3 broadcasted iotas and region wheres correct3d builds
           per chunk
  rolls  — + the four in-plane jnp.roll reads (p/rho j-1, k-1 shifts)
  real   — pallas_correct3d itself

If `copy` hits ~0.33 ms (268 MB at peak), the scheme is healthy and the
kernels are VPU-bound -> attack mask/roll work. If `copy` is already
~1 ms, the DMA scheme itself underperforms -> attack DMA shape/depth.
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

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.config import Fluid
from tpuvof.solver3d import _pad_jk
from tpuvof.pallas_kernels.step3d import (
    _iota3, _sh3, pallas_correct3d, _any_specs, _vmem_params,
)

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "200"))
g = Grid3D(N, N, N)
fl = Fluid()
B = 8 if N % 8 == 0 else 4
REPS = 60


def _probe_kernel(a_h, b_h, c_h, d_h, e_h, o1_h, o2_h, o3_h,
                  ab, bb, cb, db, eb, o1b, o2b, o3b,
                  sems, osems, *, nloc, B, mode, g):
    nc = nloc // B
    ins = ((a_h, ab), (b_h, bb), (c_h, cb), (d_h, db), (e_h, eb))
    outs = ((o1b, o1_h), (o2b, o2_h), (o3b, o3_h))

    def in_dma(slot, c, i):
        h, b = ins[i]
        return pltpu.make_async_copy(
            h.at[pl.ds(1 + c * B, B)], b.at[pl.ds(slot * B, B)],
            sems.at[slot * 5 + i])

    def out_dma(slot, c, i):
        b, h = outs[i]
        return pltpu.make_async_copy(
            b.at[pl.ds(slot * B, B)], h.at[pl.ds(1 + c * B, B)],
            osems.at[slot * 3 + i])

    for i in range(5):
        in_dma(0, 0, i).start()

    def body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            for i in range(5):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

        for i in range(5):
            in_dma(slot, c, i).wait()

        sB = slot * B
        a = ab[pl.ds(sB, B)]
        b = bb[pl.ds(sB, B)]
        cc = cb[pl.ds(sB, B)]
        d = db[pl.ds(sB, B)]
        e = eb[pl.ds(sB, B)]
        if mode == 0:
            u, v, w = a + e, b + e, cc + e
        else:
            shape = a.shape
            gi = _iota3(shape, 0) + 1 + c * B
            j = _iota3(shape, 1)
            k = _iota3(shape, 2)
            j_int = (j >= 1) & (j <= g.ny)
            k_int = (k >= 1) & (k <= g.nz)
            i_int = (gi >= 1) & (gi <= g.nx)
            if mode >= 2:
                v_s = _sh3(d, 0, -1, 0)
                w_s = _sh3(d, 0, 0, -1)
                r_s = _sh3(e, 0, -1, 0)
                r_k = _sh3(e, 0, 0, -1)
                u = a - 2.0 / (e + e) * (d - d) * g.dxi
                v = b - 2.0 / (e + r_s) * (d - v_s) * g.dyi
                w = cc - 2.0 / (e + r_k) * (d - w_s) * g.dzi
            else:
                u, v, w = a + e, b + e, cc + e
            u = jnp.where((gi >= 2) & (gi <= g.nx) & j_int & k_int, u, 0.0)
            v = jnp.where(i_int & (j >= 2) & (j <= g.ny) & k_int, v, 0.0)
            w = jnp.where(i_int & j_int & (k >= 2) & (k <= g.nz), w, 0.0)

        @pl.when(c >= 2)
        def _():
            for i in range(3):
                out_dma(slot, c - 2, i).wait()

        o1b[pl.ds(sB, B)] = u
        o2b[pl.ds(sB, B)] = v
        o3b[pl.ds(sB, B)] = w
        for i in range(3):
            out_dma(slot, c, i).start()
        return 0

    lax.fori_loop(0, nc, body, 0)
    for c in (nc - 2, nc - 1):
        for i in range(3):
            out_dma(c % 2, c, i).wait()


def probe(mode, x):
    shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    plane = x.shape[1:]
    blk = lambda n: pltpu.VMEM((n, *plane), x.dtype)  # noqa: E731
    return pl.pallas_call(
        partial(_probe_kernel, nloc=N, B=B, mode=mode, g=g),
        out_shape=(shape,) * 3,
        in_specs=_any_specs(5),
        out_specs=tuple(_any_specs(3)),
        scratch_shapes=[blk(2 * B)] * 8 + [
            pltpu.SemaphoreType.DMA((10,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=_vmem_params(40 * B * plane[0] * plane[1] * 4),
    )(x, x, x, x, x)


p1, p2 = _pad_jk(g)
x = jnp.asarray(
    np.random.default_rng(0).random((N + 2, N + 2 + p1, N + 2 + p2)),
    jnp.float32) * 0.1 + 1.0
vol = x.size * 4 / 1e9
print(f"volume {vol*1000:.1f} MB, traffic/call {8*vol*1000:.0f} MB, B={B}",
      flush=True)


def timeit(name, fn, arg):
    out = fn(arg)
    jax.block_until_ready(out)
    o0 = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(o0[:1, :1, :8])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = arg
        for _ in range(REPS):
            o = fn(o)
        o0 = o[0] if isinstance(o, (tuple, list)) else o
        np.asarray(o0[:1, :1, :8])
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"{name:8s}: {best*1000:7.3f} ms  -> {8*vol/best:6.0f} GB/s eff",
          flush=True)
    return best


@jax.jit
def chain0(a):
    r = probe(0, a)
    return r[0]


@jax.jit
def chain1(a):
    r = probe(1, a)
    return r[0]


@jax.jit
def chain2(a):
    r = probe(2, a)
    return r[0]


@jax.jit
def chain_real(a):
    u, v, w = pallas_correct3d(g, fl, 4e-6, a, a, a, a, a)
    return u


timeit("copy", chain0, x)
timeit("masks", chain1, x)
timeit("rolls", chain2, x)
timeit("real", chain_real, x)
timeit("copy2", chain0, x)  # env drift guard
