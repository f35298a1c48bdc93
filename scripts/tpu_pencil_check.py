"""Pencil pallas engine on the real TPU: forced-pencil 1x1 bit-exactness
vs the serial pallas path + the pencil-mode overhead at the 200^3
flagship (reference workload 3dvof.py:20-22).

The pencil engine exists to let the fast kernels run on 2-axis meshes
(px*py chips) — on one chip it PAYS vs the x-slab dist engine: the
y-extended block sweeps (ny + 2*Wy + 2)/(ny + 2) more rows through every
kernel (at 200^3, 232/208 padded rows = +11.5%) on top of the same x
cone. This script records that price honestly; the x-slab engine remains
the 1-axis-mesh default (Decomp3D only goes pencil when py > 1 or
pencil=True).

Timing per CLAUDE.md: device-resident blocked state, tiny-slice sync,
warm first, best-of-3, one process, serial re-run drift check.
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

N = int(os.environ.get("N", "200"))
STEPS = int(os.environ.get("STEPS", "90"))

g = Grid3D(N, N, N)
s0 = tv.init_state_3d(g, ic=1)

mesh11 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
mesh1 = Mesh(np.array(jax.devices()[:1]), ("mx",))

# ---- forced-pencil 1x1 bit-exactness vs serial pallas (12 steps) ----
dec_p = Decomp3D(g, mesh11, backend="pallas", pencil=True)
assert dec_p.backend == "pallas" and dec_p.pencil
want = simulate_3d(g, s0, 12, backend="pallas")
got = dec_p.simulate(s0, 12)
for name in ("F", "u", "v", "w", "p"):
    d = float(np.max(np.abs(
        np.asarray(getattr(got, name))[1:-1]
        - np.asarray(getattr(want, name))[1:-1])))
    print(f"12-step pencil-vs-serial {name}: max|d|={d:.3e}", flush=True)


def best3(run, arg):
    out = run(arg, STEPS)  # warm / compile
    np.asarray(out.F[:1, :1, :8])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(arg, STEPS)
        np.asarray(out.F[:1, :1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return best


# ---- timing: serial pallas | slab dist 1x1 | pencil dist 1x1 ----
def serial_run(s, n):
    return simulate_3d(g, s, n, backend="pallas")


dec_s = Decomp3D(g, mesh1, backend="pallas")
run_s = dec_s.make_simulate()
run_p = dec_p.make_simulate()
bs = dec_s.scatter_state(s0)
bp = dec_p.scatter_state(s0)

t_ser = best3(serial_run, s0)
t_slab = best3(run_s, bs)
t_pen = best3(run_p, bp)
t_ser2 = best3(serial_run, s0)

cups = lambda t: N ** 3 * STEPS / t / 1e9  # noqa: E731
print(f"{N}^3 x {STEPS}: serial {t_ser:.3f}s ({cups(t_ser):.3f}e9) | "
      f"slab-dist 1x1 {t_slab:.3f}s ({cups(t_slab):.3f}e9) | "
      f"pencil-dist 1x1 {t_pen:.3f}s ({cups(t_pen):.3f}e9) | "
      f"serial re-run {t_ser2:.3f}s", flush=True)
