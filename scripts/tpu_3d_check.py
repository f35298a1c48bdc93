"""TPU smoke + benchmark of the slab-tiled 3-D Pallas path.

Stage 1: 64^3, 30 steps, pallas vs xla trajectory agreement (compile check).
Stage 2: 128^3 and 200^3 timing, pallas vs xla.
Run detached: first Mosaic compiles can take minutes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.solver3d import simulate_3d

print("backend:", jax.default_backend(), flush=True)


def run(n, steps, backend, reps=1):
    g = Grid3D(n, n, n)
    s = tv.init_state_3d(g, ic=1)
    t0 = time.perf_counter()
    out = simulate_3d(g, s, steps, backend=backend)
    F = np.asarray(out.F)
    compile_s = time.perf_counter() - t0
    best = None
    st = out
    for _ in range(reps):
        t0 = time.perf_counter()
        st = simulate_3d(g, st, steps, backend=backend)
        # force device sync with a tiny host copy: block_until_ready can
        # return early over axon (CLAUDE.md), and copying the full 33 MB F
        # through the tunnel inside the timed loop added ~8 ms/step of
        # measurement artifact at 200^3 in round 2's first numbers
        np.asarray(st.F[:1, :1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return out, compile_s, best


# ---- stage 1: correctness at 64^3 ----
n, steps = 64, 30
a, ca, ta = run(n, steps, "xla", reps=2)
print(f"xla    {n}^3 x{steps}: compile {ca:.1f}s, run {ta:.3f}s", flush=True)
b, cb, tb = run(n, steps, "pallas", reps=2)
print(f"pallas {n}^3 x{steps}: compile {cb:.1f}s, run {tb:.3f}s", flush=True)
for name in ("F", "u", "v", "w", "p"):
    x = np.asarray(getattr(a, name), np.float64)
    y = np.asarray(getattr(b, name), np.float64)
    print(f"  {name}: max|diff| = {np.abs(x - y).max():.3e}", flush=True)
mass_a = np.asarray(a.F)[1:-1, 1:-1, 1:-1].sum()
mass_b = np.asarray(b.F)[1:-1, 1:-1, 1:-1].sum()
print(f"  mass: xla {mass_a:.6f} pallas {mass_b:.6f}", flush=True)
assert np.isfinite(np.asarray(b.F)).all()

# ---- stage 2: timing ----
results = {}
for n, steps in ((128, 100), (200, 100)):
    for backend in ("pallas", "xla"):
        try:
            _, c, t = run(n, steps, backend, reps=2)
            cups = n**3 * steps / t
            results[f"{n}^3/{backend}"] = dict(
                compile_s=round(c, 1), seconds=round(t, 4),
                cups=round(cups / 1e9, 3))
            print(f"{backend:7s} {n}^3 x{steps}: compile {c:.1f}s, "
                  f"best {t:.3f}s -> {cups/1e9:.3f}e9 CUPS", flush=True)
        except Exception as e:
            print(f"{backend} {n}^3 FAILED: {e!r}", flush=True)

print(json.dumps(results))
