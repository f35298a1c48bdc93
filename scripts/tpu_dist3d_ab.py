"""A/B the 3-D resident-engine halo width on the real chip (VERDICT r2 #1).

W=14 -> nloc=228 (slab chunk B=4); W=16 -> nloc=232 (B=8): same cone
validity (W >= n_jacobi+4 = 14), different chunk geometry. Also re-times
the serial pallas path in the SAME process as the env-drift check
(CLAUDE.md timing rules). Run detached: fresh Mosaic compiles take minutes.
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

# warm the chip + serial baseline
t0 = time.perf_counter()
want = simulate_3d(g, state, 30, backend="pallas")
np.asarray(want.F[:1, :1, :8])
print(f"serial warm(30): {time.perf_counter()-t0:.1f}s", flush=True)


def time_serial():
    best = None
    s = state
    for _ in range(2):
        t0 = time.perf_counter()
        s = simulate_3d(g, s, STEPS, backend="pallas")
        np.asarray(s.F[:1, :1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return N**3 * STEPS / best


print(f"serial: {time_serial():.3e} CUPS", flush=True)

for W in (14, 16):
    dec = Decomp3D(g, mesh, backend="pallas", halo_width=W)
    assert dec.backend == "pallas" and dec.W == W, (dec.backend, dec.W)
    run = dec.make_simulate()
    blocked = dec.scatter_state(state)
    t0 = time.perf_counter()
    out = run(blocked, 30)
    np.asarray(out.F[:1, :1, :8])
    print(f"W={W} nloc={dec.nloc}: compile+30 {time.perf_counter()-t0:.1f}s",
          flush=True)
    got = dec.gather_state(out)
    d = np.abs(np.asarray(got.F, np.float64)
               - np.asarray(want.F, np.float64)).max()
    best = None
    st = out
    for _ in range(2):
        t0 = time.perf_counter()
        st = run(st, STEPS)
        np.asarray(st.F[:1, :1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  F bit-diff vs serial: {d:.2e}; "
          f"{N**3 * STEPS / best:.3e} CUPS ({best:.3f}s/{STEPS})", flush=True)

print(f"serial re-check: {time_serial():.3e} CUPS (env drift guard)",
      flush=True)
