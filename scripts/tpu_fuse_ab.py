"""A/B: separate Jacobi + correct3d vs the fused jacobi_correct kernel.

The fused kernel (pallas_kernels/jacobi3d.pallas_jacobi_correct_3d)
removes correct3d's p input stream AND p's HBM round trip between the
phases (86 MB/step at ~330 GB/s ≈ 0.26 ms of naive saving), and lets
chunk-0 correction inputs prefetch during the Jacobi iterations. The
full-step measurement read 3.283 ms — identical to the unfused 3.282 —
so this isolates exactly the affected region, in-scan in ONE process
(CLAUDE.md timing rules): K iterations of

  A: pallas_jacobi_3d -> pallas_correct3d   (production round-2 pair)
  B: pallas_jacobi_correct_3d               (fused)

Outputs are first bit-compared (must be 0), then timed best-of-3.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuvof.config import Fluid
from tpuvof.grid import Grid3D
from tpuvof.solver3d import _pad_jk
from tpuvof.pallas_kernels.jacobi3d import (
    pallas_jacobi_3d,
    pallas_jacobi_correct_3d,
)
from tpuvof.pallas_kernels.step3d import pallas_correct3d

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "200"))
K = int(os.environ.get("K", "300"))
NIT = 10
g = Grid3D(N, N, N)
fl = Fluid()
dt = 4e-6
p1, p2 = _pad_jk(g)
shape3 = (N + 2, N + 2 + p1, N + 2 + p2)

rng = np.random.default_rng(0)


def vol(scale=0.1):
    return jnp.asarray(rng.random(shape3), jnp.float32) * scale


p0 = vol()
us0, vs0, ws0 = vol(1e-3), vol(1e-3), vol(1e-3)
F0 = vol(1.0)
rhs_np = rng.random(shape3).astype(np.float32) * 0.1
for ax in range(3):
    sl = [slice(None)] * 3
    sl[ax] = 0
    rhs_np[tuple(sl)] = 0.0
    sl[ax] = slice(N + 1, None)
    rhs_np[tuple(sl)] = 0.0
rhs0 = jnp.asarray(rhs_np)


@jax.jit
def run_sep(p, rhs, us, vs, ws, F):
    def body(carry, _):
        p, us = carry
        pj = pallas_jacobi_3d(g, NIT, p, rhs)
        u, v, w = pallas_correct3d(g, fl, dt, us, vs, ws, pj, F)
        # feed outputs forward so the scan can't elide work
        return (pj, us + u * 1e-9), None

    (p, us_), _ = lax.scan(body, (p, us), None, length=K)
    return p, us_


@jax.jit
def run_fused(p, rhs, us, vs, ws, F):
    def body(carry, _):
        p, us = carry
        pj, u, v, w = pallas_jacobi_correct_3d(
            g, fl, dt, NIT, p, rhs, us, vs, ws, F)
        return (pj, us + u * 1e-9), None

    (p, us_), _ = lax.scan(body, (p, us), None, length=K)
    return p, us_


# bit-compare one application
pj = pallas_jacobi_3d(g, NIT, p0, rhs0)
ua, va, wa = pallas_correct3d(g, fl, dt, us0, vs0, ws0, pj, F0)
pf, uf, vf, wf = pallas_jacobi_correct_3d(
    g, fl, dt, NIT, p0, rhs0, us0, vs0, ws0, F0)
for got, want, nm in ((pf, pj, "p"), (uf, ua, "u"), (vf, va, "v"),
                      (wf, wa, "w")):
    d = float(jnp.abs(got - want).max())
    print(f"bit-compare {nm}: {d}", flush=True)
    assert d == 0.0, nm


def t(name, fn):
    args = (p0, rhs0, us0, vs0, ws0, F0)
    out = fn(*args)
    np.asarray(out[0][:1, :1, :8])  # warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0][:1, :1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    print(f"{name:8s}: {best / K * 1e3:7.3f} ms/iter", flush=True)
    return best / K * 1e3


a = t("separate", run_sep)
b = t("fused", run_fused)
a2 = t("sep-re", run_sep)  # env drift check
print(f"fused delta: {b - a:+.3f} ms ({100 * (b - a) / a:+.1f}%), "
      f"drift {a2 - a:+.3f}", flush=True)
