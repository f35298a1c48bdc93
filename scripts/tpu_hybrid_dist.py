"""TPU measurement of the distributed HYBRID steps (VERDICT r4 #1) on a
1x1 mesh: production-upgrade runs (mg, sor_tol_rel=1e-2) through Decomp /
Decomp3D with backend='pallas', vs the serial hybrid and vs the round-4
whole-step XLA fallback they replace.

2-D: 512^2, mg --sor-tol-rel 1e-2 (serial hybrid round-4 number: 0.66e9).
3-D: 200^3, same solve (serial hybrid round-4 number: 0.81e9).
Target: dist 1x1 within ~20% of serial.

Timing targets the DEVICE-side run (`dec._run` on the blocked resident
state); `dec.simulate`'s scatter/gather host round trip is API
convenience, not step cost. Run detached: fresh Mosaic compiles take
minutes. Warm first (first large execution in a fresh process can run
10-30x slow), best-of-3, variants back-to-back in ONE process.
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
from tpuvof.parallel import Decomp, Decomp3D
from tpuvof.solver3d import simulate_3d

print("backend:", jax.default_backend(), flush=True)

MG = dict(pressure_solver="mg", sor_tol=0.0, sor_tol_rel=1e-2,
          sor_max_iter=50)


def best_of(fn, s, k=3):
    best = None
    for _ in range(k):
        t0 = time.perf_counter()
        s = fn(s)
        np.asarray(s.F[:1, :1]) if s.F.ndim == 2 else \
            np.asarray(s.F[:1, :1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, s


# ---------------- 2-D 512^2 ----------------
N2, S2 = 512, 200
cfg = tv.SimConfig(grid=tv.Grid2D(N2, N2),
                   num=tv.Numerics(backend="pallas", **MG))
state2 = tv.init_state(cfg, ic=1)

t0 = time.perf_counter()
w = tv.simulate(cfg, state2, S2)
np.asarray(w.F[:1, :1])
print(f"2-D serial hybrid compile+{S2}: {time.perf_counter()-t0:.1f}s",
      flush=True)
b, _ = best_of(lambda s: tv.simulate(cfg, s, S2), w)
print(f"2-D serial hybrid: {b:.3f}s -> {N2*N2*S2/b/1e9:.3f}e9 CUPS",
      flush=True)

mesh11 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
dec = Decomp(cfg, mesh11)
assert dec.hybrid_shard_supported()
run2 = dec.make_simulate()
blocked = dec.scatter_state(state2)
t0 = time.perf_counter()
out = run2(blocked, S2)
np.asarray(out.F[:1, :1])
print(f"2-D dist hybrid compile+{S2}: {time.perf_counter()-t0:.1f}s",
      flush=True)
d = np.abs(np.asarray(dec.gather_state(out).F, np.float64)
           - np.asarray(w.F, np.float64)).max()
print(f"2-D dist hybrid F max|diff| vs serial after {S2}: {d:.2e}",
      flush=True)
b, out = best_of(lambda s: run2(s, S2), out)
print(f"2-D dist hybrid 1x1: {b:.3f}s -> {N2*N2*S2/b/1e9:.3f}e9 CUPS",
      flush=True)

# the round-4 fallback this replaces: the whole per-shard step as XLA
cfg_x = tv.SimConfig(grid=tv.Grid2D(N2, N2),
                     num=tv.Numerics(backend="xla", **MG))
dec_x = Decomp(cfg_x, mesh11)
run2x = dec_x.make_simulate()
blocked = dec_x.scatter_state(state2)
t0 = time.perf_counter()
out = run2x(blocked, S2)
np.asarray(out.F[:1, :1])
print(f"2-D dist XLA compile+{S2}: {time.perf_counter()-t0:.1f}s",
      flush=True)
b, _ = best_of(lambda s: run2x(s, S2), out)
print(f"2-D dist XLA 1x1 (round-4 path): {b:.3f}s -> "
      f"{N2*N2*S2/b/1e9:.3f}e9 CUPS", flush=True)

# ---------------- 3-D 200^3 ----------------
N3, S3 = 200, 60
g = Grid3D(N3, N3, N3)
state3 = tv.init_state_3d(g, ic=1)

t0 = time.perf_counter()
w = simulate_3d(g, state3, S3, backend="pallas", **MG)
np.asarray(w.F[:1, :1, :8])
print(f"3-D serial hybrid compile+{S3}: {time.perf_counter()-t0:.1f}s",
      flush=True)
b, _ = best_of(lambda s: simulate_3d(g, s, S3, backend="pallas", **MG), w)
print(f"3-D serial hybrid: {b:.3f}s -> {N3**3*S3/b/1e9:.3f}e9 CUPS",
      flush=True)

mesh1 = Mesh(np.array(jax.devices()[:1]), ("mx",))
dec3 = Decomp3D(g, mesh1, backend="pallas", **MG)
assert dec3.hybrid, "3-D hybrid must be admitted"
print(f"3-D dist hybrid W={dec3.W} nloc={dec3.nloc}", flush=True)
run3 = dec3.make_simulate()
blocked = dec3.scatter_state(state3)
t0 = time.perf_counter()
out = run3(blocked, S3)
np.asarray(out.F[:1, :1, :8])
print(f"3-D dist hybrid compile+{S3}: {time.perf_counter()-t0:.1f}s",
      flush=True)
d = np.abs(np.asarray(dec3.gather_state(out).F, np.float64)
           - np.asarray(w.F, np.float64)).max()
print(f"3-D dist hybrid F max|diff| vs serial after {S3}: {d:.2e}",
      flush=True)
b, out = best_of(lambda s: run3(s, S3), out)
print(f"3-D dist hybrid 1x1: {b:.3f}s -> {N3**3*S3/b/1e9:.3f}e9 CUPS",
      flush=True)

dec3x = Decomp3D(g, mesh1, backend="xla", **MG)
run3x = dec3x.make_simulate()
blocked = dec3x.scatter_state(state3)
t0 = time.perf_counter()
out = run3x(blocked, S3)
np.asarray(out.F[:1, :1, :8])
print(f"3-D dist XLA compile+{S3}: {time.perf_counter()-t0:.1f}s",
      flush=True)
b, _ = best_of(lambda s: run3x(s, S3), out)
print(f"3-D dist XLA 1x1 (round-4 path): {b:.3f}s -> "
      f"{N3**3*S3/b/1e9:.3f}e9 CUPS", flush=True)

# env-drift check: re-run the 2-D dist hybrid at the end
blocked = dec.scatter_state(state2)
out = run2(blocked, S2)
np.asarray(out.F[:1, :1])
b, _ = best_of(lambda s: run2(s, S2), out)
print(f"2-D dist hybrid re-run (drift check): {b:.3f}s -> "
      f"{N2*N2*S2/b/1e9:.3f}e9 CUPS", flush=True)
