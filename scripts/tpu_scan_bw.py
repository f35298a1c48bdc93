"""Honest in-scan per-kernel timing for the 3-D slab kernels at 200^3.

Two prior probes disagreed: tpu_3d_bw.py (standalone chained calls) found
pure-copy == real-correct at ~350 GB/s, while tpu_dma_probe.py's XLA
pointwise reference measured 0.625 ms for 86 MB (138 GB/s) where the same
chip is known to do 905 GB/s — i.e. standalone-call timing carries a
~0.5 ms per-launch overhead over the axon tunnel that poisons every
per-kernel number. Inside ONE compiled program there is no launch
overhead, so here every kernel is timed as a K-iteration `lax.scan` in a
single jit, back-to-back in one process:

  xla pointwise scan   — launch-overhead-free bandwidth ceiling
  slab copy scan       — the double-buffer scheme's true DMA ceiling
  predict/jacobi/correct/sweep scans — true per-kernel cost
  full step scan       — anchor (must reproduce ~3.3-3.6 ms/step)

Per-kernel HBM traffic (43 MB padded volumes): predict 8 (4r+4w),
jacobi-10 3 (p+rhs read, p written; VMEM-resident iterations),
correct 8 (5r+3w), each sweep 3 (2r+1w). Step total 28 vols = 1.20 GB
-> 1.47 ms/step floor at the v5e's 819 GB/s.
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
from tpuvof.solver3d import _pad_jk, simulate_3d
from tpuvof.state import State3D
from tpuvof.pallas_kernels.step3d import (
    _any_specs,
    _vmem_params,
    pallas_correct3d,
    pallas_fct3d_sweep,
    pallas_predict3d_rhs,
)
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "200"))
K = int(os.environ.get("K", "30"))
g = Grid3D(N, N, N)
fl = Fluid()
dt = 4e-6
B = 8 if N % 8 == 0 else 4

p1, p2 = _pad_jk(g)
shape3 = (N + 2, N + 2 + p1, N + 2 + p2)
x = jnp.asarray(
    np.random.default_rng(0).random(shape3), jnp.float32) * 0.1 + 1.0
VOL = int(np.prod(shape3)) * 4 / 1e9  # GB per volume


def _copy_kernel(a_h, b_h, c_h, d_h, e_h, o1_h, o2_h, o3_h,
                 ab, bb, cb, db, eb, o1b, o2b, o3b,
                 sems, osems, *, nloc, B):
    """pallas_correct3d's exact DMA structure (5 in / 3 out volume
    streams, double-buffered B-plane slabs), pass-through compute."""
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
        u, v, w = a + e, b + e, cc + e

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


def copy53(a, b, c, d, e):
    sh = jax.ShapeDtypeStruct(shape3, jnp.float32)
    plane = shape3[1:]
    blk = lambda n: pltpu.VMEM((n, *plane), jnp.float32)  # noqa: E731
    return pl.pallas_call(
        partial(_copy_kernel, nloc=N, B=B),
        out_shape=(sh,) * 3,
        in_specs=_any_specs(5),
        out_specs=tuple(_any_specs(3)),
        scratch_shapes=[blk(2 * B)] * 8 + [
            pltpu.SemaphoreType.DMA((10,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=_vmem_params(40 * B * plane[0] * plane[1] * 4),
    )(a, b, c, d, e)


def t(name, fn, args, vols):
    """Time fn as compiled; report per-scan-iteration ms and GB/s."""
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
    print(f"{name:26s}: {ms:7.3f} ms/iter -> {vols * VOL / (ms / 1e3):6.0f}"
          f" GB/s eff  (compile {c:.1f}s)", flush=True)
    return ms


def scan(body):
    @jax.jit
    def run(*args):
        out, _ = lax.scan(lambda c, _: (body(*c), None), args, None,
                          length=K)
        return out

    return run


# --- window-health anchor FIRST: the production step has a known good
# value (3.3-3.6 ms/step at 200^3); if this reads far higher, the chip is
# in a degraded window and the whole run must be discarded ---
def anchor(tag):
    s = tv.init_state_3d(g, ic=1)
    warm = simulate_3d(g, s, 3, fl=fl, dt=dt, backend="pallas", istep0=0)
    np.asarray(warm.F[:1, :1])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = simulate_3d(g, s, K * 3, fl=fl, dt=dt, backend="pallas",
                          istep0=0)
        np.asarray(out.F[:1, :1])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    ms = best / (K * 3) * 1e3
    print(f"{tag:26s}: {ms:7.3f} ms/step -> {28 * VOL / (ms / 1e3):6.0f}"
          " GB/s eff", flush=True)


anchor("full step (pre)")

# --- launch-overhead quantification: same op, scan vs chained calls ---
def xla_body(a):
    return (a + 1.0,)


xla_scan = scan(xla_body)
t("xla +1 scan", xla_scan, (x,), 2)

xla_call = jax.jit(lambda a: a + 1.0)
o = xla_call(x)
np.asarray(o[:1, :1, :8])
best = None
for _ in range(3):
    t0 = time.perf_counter()
    o = x
    for _ in range(K):
        o = xla_call(o)
    np.asarray(o[:1, :1, :8])
    d = time.perf_counter() - t0
    best = d if best is None else min(best, d)
print(f"{'xla +1 chained calls':26s}: {best / K * 1e3:7.3f} ms/iter "
      f"-> launch overhead ~{best / K * 1e3 - 0.105:0.3f} ms", flush=True)

# --- the slab scheme's true ceiling ---
t("slab copy 5in/3out", scan(lambda a, b, c: (*copy53(a, b, c, a, b),)),
  (x, x + 1e-3, x + 2e-3), 8)

# --- per-kernel honest costs ---
t("predict (4r+4w)", scan(
    lambda u, v, w, F: (*pallas_predict3d_rhs(g, fl, dt, u, v, w, F)[:3],
                        F)),
  (x, x, x, x), 8)
t("jacobi-10 (2r+1w)", scan(
    lambda p, rhs: (pallas_jacobi_3d(g, 10, p, rhs), rhs)),
  (x, x), 3)
t("correct (5r+3w)", scan(
    lambda us, vs, ws, p, F: (*pallas_correct3d(g, fl, dt, us, vs, ws, p,
                                                F), p, F)),
  (x, x, x, x, x), 8)
t("x-sweep (2r+1w)", scan(
    lambda F, u: (pallas_fct3d_sweep(g, dt, F, u, 0), u)), (x, x * 0.01),
  3)
t("y-sweep (2r+1w)", scan(
    lambda F, v: (pallas_fct3d_sweep(g, dt, F, v, 1), v)), (x, x * 0.01),
  3)
t("z-sweep (2r+1w)", scan(
    lambda F, w: (pallas_fct3d_sweep(g, dt, F, w, 2), w)), (x, x * 0.01),
  3)

# --- anchor again: env drift guard ---
anchor("full step (post)")

t("slab copy re-run (drift)", scan(
    lambda a, b, c: (*copy53(a, b, c, a, b),)), (x, x + 1e-3, x + 2e-3), 8)
