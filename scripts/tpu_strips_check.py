"""Strip-streaming 2-D engine at 2048^2 on the real TPU: correctness +
in-process A/B vs the tiled engine and XLA.

The strips engine (solver._step_pallas_strips / pallas_fullstep_strips)
is the single-launch replacement for the tiled loop engine beyond the
mono kernel's VMEM envelope: the padded fields stay HBM-resident across
the whole scan, full-width row strips are double-buffer DMA'd through
VMEM with each window copy-in overlapped behind the previous strip's
compute — no per-tile XLA dynamic_slice / dynamic_update_slice round
trips and one kernel launch per step instead of (nx/Tx)(ny/Ty).

Correctness gates here mirror tpu_tiled_check.py: a 10-step strips-vs-
tiled comparison (same kernel family -> tight), finiteness/bounds/mass
at horizon, and best-of-repeats throughput (CLAUDE.md timing rules:
tiny-slice sync, warm first, in-process A/B, XLA re-run as drift check).
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
cfg_t = cfg_x.replace(num=tv.Numerics(backend="pallas_tiled"))
cfg_s = cfg_x.replace(num=tv.Numerics(backend="pallas_strips"))
from tpuvof.solver import effective_backend  # noqa: E402
from tpuvof.pallas_kernels.step_kernels import strips_layout_2d  # noqa: E402

print("effective backend for pallas_strips:", effective_backend(cfg_s),
      flush=True)
print("strip layout (Tx, W2, P0, P1, Exp, Lout, ntx):",
      strips_layout_2d(cfg_s), flush=True)

s0 = tv.init_state(cfg_x, ic=1)

# ---- short-horizon parity: strips vs tiled (same kernel family) ----
a = tv.simulate(cfg_t, s0, 10)
b = tv.simulate(cfg_s, s0, 10)
np.asarray(a.F[:1, :1]), np.asarray(b.F[:1, :1])
dF = float(jnp.abs(a.F - b.F).max())
du = float(jnp.abs(a.u - b.u).max())
dp = float(jnp.abs(a.p - b.p).max())
print(f"10-step strips-vs-tiled: dF={dF:.3e} du={du:.3e} dp={dp:.3e}",
      flush=True)
# both engines run the identical windowed step body on fully-valid
# cones; differences can only come from FMA contraction of differently
# shaped programs. A stitching/junk bug would put dF at O(1).
assert dF < 5e-2 and du < 2e-1, "strips diverged beyond amplified noise"


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
st = t("strips", cfg_s)
xt2 = t("xla re-run", cfg_x)
print(f"strips speedup vs tiled: {tt / st:.2f}x, vs xla: {xt / st:.2f}x "
      f"(env drift {xt2 - xt:+.3f}s)", flush=True)
