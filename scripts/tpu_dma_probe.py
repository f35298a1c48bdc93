"""Why does the slab double-buffer cap at ~350 GB/s when XLA pointwise
hits ~905 GB/s? (follow-up to tpu_3d_bw.py's copy==real finding)

Matrix, all in ONE process: buffer depth (2 vs 4 slots), slab thickness
B (8/20/40/100), stream count (1in/1out vs 5in/3out), vs the XLA fused
pointwise reference moving the same bytes.
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

from tpuvof.pallas_kernels.step3d import _any_specs, _vmem_params

print("backend:", jax.default_backend(), flush=True)

N = 200
NP1, NP2 = 208, 256
REPS = 60
shape3 = (N + 2, NP1, NP2)


def _copy_kernel(*refs, n_in, n_out, B, depth, nloc):
    ins = refs[:n_in]
    outs = refs[n_in:n_in + n_out]
    bufs = refs[n_in + n_out:n_in + n_out + n_in]
    obufs = refs[n_in + n_out + n_in:n_in + 2 * n_out + 2 * n_in]
    sems, osems = refs[-2], refs[-1]
    nc = nloc // B

    def in_dma(slot, c, i):
        return pltpu.make_async_copy(
            ins[i].at[pl.ds(1 + c * B, B)],
            bufs[i].at[pl.ds(slot * B, B)],
            sems.at[slot * n_in + i])

    def out_dma(slot, c, i):
        return pltpu.make_async_copy(
            obufs[i].at[pl.ds(slot * B, B)],
            outs[i].at[pl.ds(1 + c * B, B)],
            osems.at[slot * n_out + i])

    for c0 in range(min(depth - 1, nc)):
        for i in range(n_in):
            in_dma(c0 % depth, c0, i).start()

    def body(c, _):
        slot = lax.rem(c, depth)

        @pl.when(c + depth - 1 < nc)
        def _():
            for i in range(n_in):
                in_dma(lax.rem(c + depth - 1, depth), c + depth - 1,
                       i).start()

        for i in range(n_in):
            in_dma(slot, c, i).wait()

        vals = [bufs[i][pl.ds(slot * B, B)] for i in range(n_in)]

        @pl.when(c >= depth)
        def _():
            for i in range(n_out):
                out_dma(slot, c - depth, i).wait()

        for i in range(n_out):
            obufs[i][pl.ds(slot * B, B)] = vals[i % n_in] + 1.0
        for i in range(n_out):
            out_dma(slot, c, i).start()
        return 0

    lax.fori_loop(0, nc, body, 0)
    for c in range(max(nc - depth, 0), nc):
        for i in range(n_out):
            out_dma(c % depth, c, i).wait()


def make_copy(n_in, n_out, B, depth):
    sh = jax.ShapeDtypeStruct(shape3, jnp.float32)
    blk = lambda n: pltpu.VMEM((n, NP1, NP2), jnp.float32)  # noqa: E731

    def fn(*xs):
        return pl.pallas_call(
            partial(_copy_kernel, n_in=n_in, n_out=n_out, B=B, depth=depth,
                    nloc=N),
            out_shape=(sh,) * n_out,
            in_specs=_any_specs(n_in),
            out_specs=tuple(_any_specs(n_out)),
            scratch_shapes=[blk(depth * B)] * (n_in + n_out) + [
                pltpu.SemaphoreType.DMA((depth * n_in,)),
                pltpu.SemaphoreType.DMA((depth * n_out,)),
            ],
            compiler_params=_vmem_params(
                2 * (n_in + n_out) * depth * B * NP1 * NP2 * 4),
        )(*xs)

    return fn


x = jnp.asarray(np.random.default_rng(0).random(shape3), jnp.float32)


def timeit(name, fn, args, nbytes):
    out = fn(*args)
    jax.block_until_ready(out)
    o0 = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(o0[:1, :1, :8])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        o0 = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(o0[:1, :1, :8])
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"{name:28s}: {best*1e3:7.3f} ms -> {nbytes/best/1e9:6.0f} GB/s",
          flush=True)


vol = int(np.prod(shape3)) * 4

# XLA fused pointwise reference (same 2-volume traffic as 1in/1out)
xla1 = jax.jit(lambda a: a + 1.0)
timeit("xla 1in/1out pointwise", xla1, (x,), 2 * vol)
xla8 = jax.jit(lambda a, b, c, d, e: (a + b, c + d, e + a))
timeit("xla 5in/3out pointwise", xla8, (x, x, x, x, x), 8 * vol)

for n_in, n_out in ((1, 1), (5, 3)):
    for B, depth in ((8, 2), (8, 4), (20, 2), (40, 2), (40, 4), (100, 2)):
        if (N % B) or (N // B) < depth:
            continue
        name = f"slab {n_in}in/{n_out}out B={B} d={depth}"
        timeit(name, make_copy(n_in, n_out, B, depth),
               (x,) * n_in, (n_in + n_out) * vol)
