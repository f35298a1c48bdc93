"""A/B: DMA-overlapped mono kernel vs the VMEM-window mono at 512^2.

The remainder closure (scripts/tpu_2d_remainder_ab.py) measured ~51 of
~126 us/step as Mosaic's strictly-serial window I/O. pallas_fullstep_dma
starts all input DMAs together (p's completes under predict) and stores
each output the moment its field+BC is final (p under correct+sweeps,
u/v under the sweeps, F last), targeting most of that 51 us. Arithmetic
is bit-identical (CPU interpret pin + the 10-step TPU delta below).

In-scan, one process, best-of-3 (CLAUDE.md timing rules).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from jax import lax

import tpuvof as tv
from tpuvof.ops import apply_bc
from tpuvof.pallas_kernels.step_kernels import (
    pallas_fullstep,
    pallas_fullstep_dma,
)

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "512"))
STEPS = 500
cfg = tv.SimConfig(grid=tv.Grid2D(N, N))

s0 = tv.init_state(cfg, ic=1)
u, v, F, p = apply_bc(s0.u, s0.v, s0.F, s0.p)
s0 = (F, u, v, p)


def make_run(step_fn):
    @jax.jit
    def run(F, u, v, p):
        def pair(c, _):
            F, u, v, p = c
            F, u, v, p = step_fn(cfg, F, u, v, p, False)
            F, u, v, p = step_fn(cfg, F, u, v, p, True)
            return (F, u, v, p), None

        c, _ = lax.scan(pair, (F, u, v, p), None, length=STEPS // 2)
        return c

    return run


def t(name, fn):
    t0 = time.perf_counter()
    out = fn(*s0)
    np.asarray(out[0][:1, :8])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*s0)
        np.asarray(out[0][:1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:16s}: {best/STEPS*1e6:7.2f} us/step "
          f"({N*N*STEPS/best/1e9:.2f}e9 CUPS, compile {c:.1f}s)",
          flush=True)
    return best, out


win_t, win_out = t("window mono", make_run(pallas_fullstep))
dma_t, dma_out = t("dma mono", make_run(pallas_fullstep_dma))
win2_t, _ = t("window re-run", make_run(pallas_fullstep))

d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(win_out, dma_out))
print(f"\n{STEPS}-step trajectory max|delta|: {d:.3e}", flush=True)
print(f"dma/window: {dma_t/win_t:.3f} (re-run drift "
      f"{win2_t/win_t:.3f})", flush=True)
