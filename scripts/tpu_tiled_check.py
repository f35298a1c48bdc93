"""Tiled 2-D engine at 2048^2 on the real TPU: correctness + throughput.

2048^2 exceeds the mono kernel's whole-field VMEM envelope; before this
engine the only path was XLA (~1.2e9 CUPS at 1024^2). The tiled engine
streams the windowed whole-step kernel over 16 tiles of 512^2 (block
558^2 — the same program shape as the 2-D distributed 1x1 engine, so the
Mosaic binary is shared with that path's cache).

Correctness evidence is NOT the XLA comparison: the compiled tiled
engine is BIT-identical to the mono kernel (scripts/tpu_tiled_diag.py:
dF=du=dv=dp=0.0 after 10 steps with 16 tiles at 512^2; single-step pins
in tests_tpu). The kernel family differs from the XLA path by f32
reassociation noise that the sharp-interface dynamics amplify (measured
512^2 10-step mono-vs-xla: dF=2.8e-5, du=1.9e-3, dp=14 — no tiling
involved), so the XLA comparison here is a coarse amplified-noise gate,
plus finiteness/bounds/mass at horizon and best-of-repeats throughput
(CLAUDE.md timing rules: tiny-slice sync, warm first, in-process A/B).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpuvof as tv

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "2048"))
STEPS = int(os.environ.get("STEPS", "500"))

cfg_x = tv.SimConfig(grid=tv.Grid2D(N, N), num=tv.Numerics(backend="xla"))
cfg_t = cfg_x.replace(num=tv.Numerics(backend="pallas_mono"))
from tpuvof.solver import effective_backend  # noqa: E402

print("effective backend for pallas_mono:", effective_backend(cfg_t),
      flush=True)

s0 = tv.init_state(cfg_x, ic=1)

# ---- short-horizon parity vs XLA (backend FMA noise only) ----
a = tv.simulate(cfg_x, s0, 10)
b = tv.simulate(cfg_t, s0, 10)
np.asarray(a.F[:1, :1]), np.asarray(b.F[:1, :1])
dF = float(jnp.abs(a.F - b.F).max())
du = float(jnp.abs(a.u - b.u).max())
dp = float(jnp.abs(a.p - b.p).max())
print(f"10-step tiled-vs-xla: dF={dF:.3e} du={du:.3e} dp={dp:.3e}",
      flush=True)
# amplified-f32-noise gate (see module docstring; measured 4.8e-3 /
# 4.0e-2 at 2048^2) — a stitching bug would put dF at O(1)
assert dF < 5e-2 and du < 2e-1, "tiled diverged beyond amplified noise"


def t(name, cfg):
    run = lambda s: tv.simulate(cfg, s, STEPS)  # noqa: E731
    out = run(s0)
    np.asarray(out.F[:1, :1])  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(s0)
        np.asarray(out.F[:1, :1])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    cups = N * N * STEPS / best
    print(f"{name:12s}: {best:7.3f} s/{STEPS} -> {cups / 1e9:.3f}e9 CUPS",
          flush=True)
    F = np.asarray(out.F)
    assert np.isfinite(F).all() and F.min() >= 0.0 and F.max() <= 1.0
    print(f"   mass={F[1:-1, 1:-1].sum():.1f} finite+bounded OK", flush=True)
    return best


xt = t("xla", cfg_x)
tt = t("tiled", cfg_t)
xt2 = t("xla re-run", cfg_x)
print(f"tiled speedup vs xla: {xt / tt:.2f}x (env drift {xt2 - xt:+.3f}s)",
      flush=True)
