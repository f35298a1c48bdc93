"""TPU measurement of the distributed 3-D engines on a 1x1 mesh at 200^3
(the machinery cost vs the serial path; multi-chip runs ride the same code
over ICI).

Timing targets the DEVICE-side run (`dec._run` on the blocked, resident
state): `dec.simulate` round-trips the whole state through host numpy for
scatter/gather (5 x 33 MB over the axon tunnel), which is API convenience,
not step cost. Run detached: fresh Mosaic compiles take minutes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.parallel import Decomp3D
from tpuvof.solver3d import simulate_3d

print("backend:", jax.default_backend(), flush=True)
N, STEPS = 200, 90
g = Grid3D(N, N, N)
state = tv.init_state_3d(g, ic=1)
mesh = Mesh(np.array(jax.devices()[:1]), ("mx",))

# serial reference for trajectory + speed
t0 = time.perf_counter()
want = simulate_3d(g, state, 30, backend="pallas")
np.asarray(want.F[:1, :1, :8])
print(f"serial pallas compile+30: {time.perf_counter()-t0:.1f}s", flush=True)

for backend in ("pallas", "xla"):
    dec = Decomp3D(g, mesh, backend=backend)
    print(f"dist backend={dec.backend}"
          + (f" W={dec.W} nloc={dec.nloc}" if dec.backend == "pallas" else ""),
          flush=True)
    run = dec.make_simulate()
    blocked = dec.scatter_state(state)
    t0 = time.perf_counter()
    out = run(blocked, 30)
    np.asarray(out.F[:1, :1, :8])
    print(f"  compile+30 steps: {time.perf_counter()-t0:.1f}s", flush=True)
    got = dec.gather_state(out)
    d = np.abs(np.asarray(got.F, np.float64)
               - np.asarray(want.F, np.float64)).max()
    print(f"  F max|diff| vs serial pallas after 30: {d:.2e}", flush=True)
    best = None
    st = out
    for _ in range(2):
        t0 = time.perf_counter()
        st = run(st, STEPS)
        np.asarray(st.F[:1, :1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    cups = N**3 * STEPS / best
    print(f"  {STEPS} steps best {best:.3f}s -> {cups/1e9:.3f}e9 CUPS",
          flush=True)
