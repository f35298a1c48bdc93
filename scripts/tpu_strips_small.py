"""Does the strip-streaming engine win BELOW the VMEM envelope too?

In-process A/B on the real chip:
  serial:      mono (the 512^2/1024^2 champion) vs strips (single strip)
  distributed: 1x1 Decomp auto (full-block windowed, round-2: 21% tax at
               512^2) vs Decomp(engine='strips')

If dist-strips beats dist-full at 512^2, the shard auto-routing should
prefer strips everywhere, not only beyond VMEM; if serial strips matches
mono at 512^2, the whole serial pallas family collapses onto one engine.
Timing per CLAUDE.md (tiny-slice sync, warm, best-of-3, drift re-run).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.parallel import Decomp

print("backend:", jax.default_backend(), flush=True)

STEPS = int(os.environ.get("STEPS", "1000"))


def best3(run):
    out = run()
    np.asarray(out.F[:1, :8])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out.F[:1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return best


for N in (512, 1024):
    cfg_m = tv.SimConfig(grid=tv.Grid2D(N, N),
                         num=tv.Numerics(backend="pallas_mono"))
    cfg_s = cfg_m.replace(num=tv.Numerics(backend="pallas_strips"))
    s0 = tv.init_state(cfg_m, ic=1)
    tm = best3(lambda: tv.simulate(cfg_m, s0, STEPS))
    ts = best3(lambda: tv.simulate(cfg_s, s0, STEPS))
    tm2 = best3(lambda: tv.simulate(cfg_m, s0, STEPS))
    cups = lambda t: N * N * STEPS / t / 1e9  # noqa: E731
    print(f"serial {N}^2: mono {tm:.3f}s ({cups(tm):.2f}e9) | strips "
          f"{ts:.3f}s ({cups(ts):.2f}e9) | mono re-run {tm2:.3f}s",
          flush=True)

N = 512
cfg = tv.SimConfig(grid=tv.Grid2D(N, N),
                   num=tv.Numerics(backend="pallas_mono"))
s0 = tv.init_state(cfg, ic=1)
mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))

dec_f = Decomp(cfg, mesh)                      # auto: full-block windowed
dec_s = Decomp(cfg, mesh, engine="strips")     # forced strips
run_f = dec_f.make_simulate()
run_s = dec_s.make_simulate()
bf = dec_f.scatter_state(s0)
bs = dec_s.scatter_state(s0)
tf = best3(lambda: run_f(bf, STEPS))
ts = best3(lambda: run_s(bs, STEPS))
tf2 = best3(lambda: run_f(bf, STEPS))
cups = lambda t: N * N * STEPS / t / 1e9  # noqa: E731
print(f"dist 1x1 {N}^2: full-block {tf:.3f}s ({cups(tf):.2f}e9) | strips "
      f"{ts:.3f}s ({cups(ts):.2f}e9) | full re-run {tf2:.3f}s", flush=True)

# sanity: forced strips shard trajectory equals the auto engine's
a = dec_f.simulate(s0, 10)
b = dec_s.simulate(s0, 10)
for name in ("F", "u", "v", "p"):
    d = float(np.max(np.abs(
        np.asarray(getattr(a, name))[1:-1, 1:-1]
        - np.asarray(getattr(b, name))[1:-1, 1:-1])))
    print(f"10-step full-vs-strips {name}: max|d|={d:.3e}", flush=True)
