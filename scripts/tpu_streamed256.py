"""Beyond-VMEM single-chip 3-D A/B (VERDICT r3 #4): 256^3.

At 256^3 the VMEM-resident Jacobi volume no longer fits (~105 MB padded p
alone), so round 3 dropped the WHOLE step to the ~0.2e9-CUPS XLA fallback.
This measures the round-4 alternative: slab kernels for predict/correct/
sweeps (their per-chunk working set still fits) + the HBM-streamed
out-of-place Jacobi (pallas_kernels.jacobi3d.streamed_jacobi_3d).

Stage 1: N^3 trajectory agreement pallas(streamed) vs xla (30 steps) at
N=256 itself — beyond the resident-Jacobi envelope (which reaches ~250^3
where the z-pad is favorable; 256^3 pads nz to 384 and does not fit), so
the streamed routing is what actually runs. Stage 2: N^3 timing, pallas
vs xla, best-of-3.

Run detached: fresh Mosaic compiles. env STEPS=100 N=256
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.solver3d import simulate_3d, pallas3d_supported
from tpuvof.pallas_kernels.jacobi3d import jacobi3d_fits_vmem

print("backend:", jax.default_backend(), flush=True)
N = int(os.environ.get("N", "256"))
STEPS = int(os.environ.get("STEPS", "100"))


def run(n, steps, backend, reps=1):
    g = Grid3D(n, n, n)
    s = tv.init_state_3d(g, ic=1)
    t0 = time.perf_counter()
    out = simulate_3d(g, s, steps, backend=backend)
    np.asarray(out.F[:1, :1, :8])
    comp = time.perf_counter() - t0
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        st = simulate_3d(g, out, steps, istep0=0, backend=backend)
        np.asarray(st.F[:1, :1, :8])
        best = min(best or 1e9, time.perf_counter() - t0)
    return out, comp, best


# ---- stage 1: correctness at N^3 (streamed routing active) ----
gN = Grid3D(N, N, N)
assert not jacobi3d_fits_vmem(gN), f"{N}^3 unexpectedly fits VMEM"
assert pallas3d_supported(gN), f"{N}^3 should admit the streamed route"
a, ca, ta = run(N, 30, "xla", reps=1)
print(f"xla    {N}^3 x30: compile {ca:.1f}s run {ta:.3f}s", flush=True)
b, cb, tb = run(N, 30, "pallas", reps=1)
print(f"pallas {N}^3 x30: compile {cb:.1f}s run {tb:.3f}s", flush=True)
for name in ("F", "u", "v", "w", "p"):
    x = np.asarray(getattr(a, name), np.float64)
    y = np.asarray(getattr(b, name), np.float64)
    print(f"  {name}: max|diff| = {np.abs(x - y).max():.3e}", flush=True)
assert np.isfinite(np.asarray(b.F)).all()
assert np.abs(np.asarray(a.F, np.float64)
              - np.asarray(b.F, np.float64)).max() < 1e-3

# ---- stage 2: 256^3 timing ----
_, cp, tp = run(N, STEPS, "pallas", reps=3)
cups_p = N**3 * STEPS / tp
print(f"pallas {N}^3 x{STEPS}: compile {cp:.1f}s best {tp:.3f}s "
      f"-> {cups_p / 1e9:.3f}e9 CUPS", flush=True)
_, cx, tx = run(N, STEPS, "xla", reps=3)
cups_x = N**3 * STEPS / tx
print(f"xla    {N}^3 x{STEPS}: compile {cx:.1f}s best {tx:.3f}s "
      f"-> {cups_x / 1e9:.3f}e9 CUPS", flush=True)
print(f"speedup: {cups_p / cups_x:.2f}x", flush=True)
