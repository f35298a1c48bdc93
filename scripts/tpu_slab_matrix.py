"""Slab DMA scheme design matrix, honestly timed (jitted K-iteration scan).

tpu_scan_bw.py established: the production correct3d kernel (0.874
ms/iter) equals a pass-through kernel with its exact DMA structure
(0.850) — the slab double-buffer scheme itself caps at ~405 GB/s while
XLA pointwise streams hit ~900. This matrix varies the scheme's free
parameters on the pass-through kernel to find the ceiling:

  B      slab thickness (planes per DMA)
  depth  buffer slots (2 = double-buffer, 4 = quad)
  n_in/n_out  concurrent HBM streams (1/1 vs 5/3 = correct3d's mix)

(tpu_dma_probe.py tried this matrix first but called un-jitted
pallas_calls — 500 ms/call of retracing noise. Every fn here is jitted
and the kernel runs under lax.scan so the ~28 ms per-execution tunnel
floor amortizes to <0.1 ms/iter.)
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
K = int(os.environ.get("K", "300"))
shape3 = (N + 2, NP1, NP2)
VOL = int(np.prod(shape3)) * 4 / 1e9


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

    def call(*xs):
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

    @jax.jit
    def run(*args):
        def body(c, _):
            outs = call(*([c[i % n_in] for i in range(n_in)]))
            return tuple(outs[i % n_out] for i in range(len(c))), None

        out, _ = lax.scan(body, args, None, length=K)
        return out

    return run


x = jnp.asarray(np.random.default_rng(0).random(shape3), jnp.float32)


def t(name, fn, args, vols):
    t0 = time.perf_counter()
    out = fn(*args)
    o0 = jax.tree_util.tree_leaves(out)[0]
    np.asarray(o0[:1, :1, :8])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        o0 = jax.tree_util.tree_leaves(out)[0]
        np.asarray(o0[:1, :1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    ms = best / K * 1e3
    print(f"{name:24s}: {ms:7.3f} ms/iter -> {vols * VOL / (ms / 1e3):6.0f}"
          f" GB/s  (compile {c:.1f}s)", flush=True)
    return ms


# --- packed variants: S volumes stacked on a leading axis, ONE in and
# ONE out DMA stream moving (S, B, NP1, NP2) slabs — tests whether the
# multi-stream collapse (670 -> 328 GB/s from 1 to 8 streams) can be
# sidestepped by volume packing ---
def _packed_kernel(in_h, out_h, ib, ob, sems, osems, *, S, B, depth, nloc):
    nc = nloc // B

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            in_h.at[:, pl.ds(1 + c * B, B)],
            ib.at[:, pl.ds(slot * B, B)], sems.at[slot])

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            ob.at[:, pl.ds(slot * B, B)],
            out_h.at[:, pl.ds(1 + c * B, B)], osems.at[slot])

    for c0 in range(min(depth - 1, nc)):
        in_dma(c0 % depth, c0).start()

    def body(c, _):
        slot = lax.rem(c, depth)

        @pl.when(c + depth - 1 < nc)
        def _():
            in_dma(lax.rem(c + depth - 1, depth), c + depth - 1).start()

        in_dma(slot, c).wait()
        val = ib[:, pl.ds(slot * B, B)]

        @pl.when(c >= depth)
        def _():
            out_dma(slot, c - depth).wait()

        ob[:, pl.ds(slot * B, B)] = val + 1.0
        out_dma(slot, c).start()
        return 0

    lax.fori_loop(0, nc, body, 0)
    for c in range(max(nc - depth, 0), nc):
        out_dma(c % depth, c).wait()


def make_packed(S, B, depth):
    shp = (S, *shape3)
    sh = jax.ShapeDtypeStruct(shp, jnp.float32)

    def call(a):
        return pl.pallas_call(
            partial(_packed_kernel, S=S, B=B, depth=depth, nloc=N),
            out_shape=sh,
            in_specs=_any_specs(1),
            out_specs=_any_specs(1)[0],
            scratch_shapes=[
                pltpu.VMEM((S, depth * B, NP1, NP2), jnp.float32),
                pltpu.VMEM((S, depth * B, NP1, NP2), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            compiler_params=_vmem_params(3 * S * depth * B * NP1 * NP2 * 4),
        )(a)

    @jax.jit
    def run(a):
        out, _ = lax.scan(lambda c, _: (call(c), None), a, None, length=K)
        return out

    return run


# packed S>=3 measured 292-318 GB/s on 2026-08-17 (strided multi-block
# DMAs degrade; see log) — packing is a recorded negative result, so the
# matrix now maps the stream-concurrency space instead
# (run `PACKED=1` to re-measure the packed variants)
if os.environ.get("PACKED"):
    for S in (3, 4, 8):
        xs = jnp.stack([x + i * 1e-3 for i in range(S)])
        for B, depth in ((8, 2), (8, 4), (20, 2)):
            if S * 2 * depth * B * NP1 * NP2 * 4 > 100e6:
                continue
            t(f"packed S={S} B={B} d={depth}", make_packed(S, B, depth),
              (xs,), 2 * S)


# --- per-stream semaphore-array variant: same DMA structure as
# make_copy(5,3) but each stream gets its OWN DMA((depth,)) semaphore
# array — tests whether semaphore-array sharing is what serializes the
# 8-stream kernel ---
def _sepsem_kernel(*refs, n_in, n_out, B, depth, nloc):
    ins = refs[:n_in]
    outs = refs[n_in:n_in + n_out]
    bufs = refs[n_in + n_out:2 * n_in + n_out]
    obufs = refs[2 * n_in + n_out:2 * (n_in + n_out)]
    sems = refs[2 * (n_in + n_out):]
    nc = nloc // B

    def in_dma(slot, c, i):
        return pltpu.make_async_copy(
            ins[i].at[pl.ds(1 + c * B, B)],
            bufs[i].at[pl.ds(slot * B, B)], sems[i].at[slot])

    def out_dma(slot, c, i):
        return pltpu.make_async_copy(
            obufs[i].at[pl.ds(slot * B, B)],
            outs[i].at[pl.ds(1 + c * B, B)], sems[n_in + i].at[slot])

    for i in range(n_in):
        in_dma(0, 0, i).start()

    def body(c, _):
        slot = lax.rem(c, depth)

        @pl.when(c + 1 < nc)
        def _():
            for i in range(n_in):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

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
    for c in (nc - 2, nc - 1):
        for i in range(n_out):
            out_dma(c % depth, c, i).wait()


def make_sepsem(n_in, n_out, B, depth):
    sh = jax.ShapeDtypeStruct(shape3, jnp.float32)
    blk = lambda n: pltpu.VMEM((n, NP1, NP2), jnp.float32)  # noqa: E731

    def call(*xs):
        return pl.pallas_call(
            partial(_sepsem_kernel, n_in=n_in, n_out=n_out, B=B,
                    depth=depth, nloc=N),
            out_shape=(sh,) * n_out,
            in_specs=_any_specs(n_in),
            out_specs=tuple(_any_specs(n_out)),
            scratch_shapes=(
                [blk(depth * B)] * (n_in + n_out)
                + [pltpu.SemaphoreType.DMA((depth,))] * (n_in + n_out)),
            compiler_params=_vmem_params(
                2 * (n_in + n_out) * depth * B * NP1 * NP2 * 4),
        )(*xs)

    @jax.jit
    def run(*args):
        def body(c, _):
            outs = call(*([c[i % n_in] for i in range(n_in)]))
            return tuple(outs[i % n_out] for i in range(len(c))), None

        out, _ = lax.scan(body, args, None, length=K)
        return out

    return run


base = None
MIXES = (((5, 3), (2, 2)) if os.environ.get("SEPSEM_ONLY") else
         ((5, 3), (1, 1), (2, 2), (2, 1), (4, 4), (4, 2),
          (3, 1), (4, 1), (6, 2), (8, 1)))
for n_in, n_out in MIXES:
    carry = tuple(x + i * 1e-3 for i in range(max(n_in, n_out)))
    # full (B, depth) sweep recorded 2026-08-17: B=8 d=2 wins for every
    # stream mix (B>=40 pays pipeline fill/drain, d=4 never helps); keep
    # only the references for cross-run comparability
    for B, depth in ((8, 2),):
        if (N % B) or (N // B) < depth:
            continue
        if (n_in + n_out) * depth * B * NP1 * NP2 * 4 > 100e6:
            continue  # VMEM envelope (v5e: 128 MB)
        ms = t(f"{n_in}in/{n_out}out B={B} d={depth}",
               make_copy(n_in, n_out, B, depth), carry, n_in + n_out)
        if base is None:
            base = ms
for n_in, n_out in ((5, 3), (2, 2)):
    carry = tuple(x + i * 1e-3 for i in range(max(n_in, n_out)))
    t(f"sepsem {n_in}in/{n_out}out", make_sepsem(n_in, n_out, 8, 2),
      carry, n_in + n_out)
t("5in/3out B=8 d=2 re-run", make_copy(5, 3, 8, 2),
  tuple(x + i * 1e-3 for i in range(5)), 8)
