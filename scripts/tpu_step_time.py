import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import tpuvof as tv
from tpuvof.grid import Grid3D
print("backend:", jax.default_backend(), flush=True)
g = Grid3D(200, 200, 200)
s = tv.init_state_3d(g, ic=1)
warm = tv.simulate_3d(g, s, 3, backend="pallas", istep0=0)
np.asarray(warm.F[:1, :1]); print("warm done", flush=True)
best = None
for _ in range(4):
    t0 = time.perf_counter()
    out = tv.simulate_3d(g, s, 900, backend="pallas", istep0=0)
    np.asarray(out.F[:1, :1])
    d = time.perf_counter() - t0
    print(f"  run: {d/900*1e3:.3f} ms/step", flush=True)
    best = d if best is None else min(best, d)
ms = best/900*1e3
print(f"fused step: {ms:.3f} ms/step -> {200**3/(ms/1e3)/1e9:.3f}e9 CUPS", flush=True)
