"""Distributed strip-streaming shard engine on the real TPU: 1x1-mesh
bit-exactness vs the serial strips engine + the beyond-VMEM distributed
tax at 2048^2, plus the serial strips engine's 4096^2 scaling point.

At 1x1 the halo refresh is a no-op (h.is_left() etc. all true), the
shard origin scalars are zero and the layout equals the serial strips
layout, so the trajectory must be BIT-identical to serial
`backend='pallas_strips'` — the same property the full-block (2-D) and
slab (3-D) shard engines pin in tests_tpu. The remaining wall-clock gap
to serial is the pure distributed-machinery tax (shard_map plumbing +
the skipped-refresh select ops); at 2048^2 the round-2 engines paid
~21% (512^2, windowed) — this engine's tax is the number to record.

Timing per CLAUDE.md: device-resident blocked state (scatter once,
outside the timed region), tiny-slice sync, warm first, best-of-3,
in-process A/B with a serial re-run drift check.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.parallel import Decomp

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "2048"))
STEPS = int(os.environ.get("STEPS", "500"))

cfg = tv.SimConfig(grid=tv.Grid2D(N, N),
                   num=tv.Numerics(backend="pallas_mono"))
s0 = tv.init_state(cfg, ic=1)

mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
dec = Decomp(cfg, mesh)
print("shard strips layout (auto):", dec.shard_strips_layout(), flush=True)
assert dec.shard_strips_layout() is not None

# ---- 1x1 bit-exactness vs serial strips (10 steps) ----
want = tv.simulate(cfg, s0, 10)           # serial: auto-routes to strips
got = dec.simulate(s0, 10)
for name in ("F", "u", "v", "p"):
    a = np.asarray(getattr(got, name))[1:-1, 1:-1]
    b = np.asarray(getattr(want, name))[1:-1, 1:-1]
    d = float(np.max(np.abs(a - b)))
    print(f"1x1 dist-vs-serial {name}: max|d|={d:.3e}", flush=True)
    assert d == 0.0, f"{name} not bit-identical at 1x1"
print("1x1 BIT-IDENTICAL ok", flush=True)

# ---- throughput: device-resident blocked state ----
run_fn = dec.make_simulate()
blocked = dec.scatter_state(s0)


def t(name, run):
    out = run()
    np.asarray(out.F[:1, :8])  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out.F[:1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    cups = N * N * STEPS / best
    print(f"{name:14s}: {best:7.3f} s/{STEPS} -> {cups / 1e9:.3f}e9 CUPS",
          flush=True)
    return best


st = t("serial strips", lambda: tv.simulate(cfg, s0, STEPS))
dt_ = t("dist 1x1", lambda: run_fn(blocked, STEPS))
st2 = t("serial re-run", lambda: tv.simulate(cfg, s0, STEPS))
print(f"distributed 1x1 tax at {N}^2: {(dt_ / st - 1) * 100:.1f}% "
      f"(drift {st2 - st:+.3f}s)", flush=True)

# ---- serial strips scaling point: 4096^2 ----
N4 = 4096
S4 = max(1, STEPS // 4)
cfg4 = tv.SimConfig(grid=tv.Grid2D(N4, N4),
                    num=tv.Numerics(backend="pallas_mono"))
from tpuvof.solver import effective_backend  # noqa: E402
from tpuvof.pallas_kernels.step_kernels import strips_layout_2d  # noqa: E402

print("4096 effective backend:", effective_backend(cfg4),
      "layout:", strips_layout_2d(cfg4), flush=True)
s4 = tv.init_state(cfg4, ic=1)
out = tv.simulate(cfg4, s4, S4)
np.asarray(out.F[:1, :8])
best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = tv.simulate(cfg4, s4, S4)
    np.asarray(out.F[:1, :8])
    d = time.perf_counter() - t0
    best = d if best is None else min(best, d)
F = np.asarray(out.F)
assert np.isfinite(F).all() and F.min() >= 0.0 and F.max() <= 1.0
print(f"serial strips 4096^2: {best:7.3f} s/{S4} -> "
      f"{N4 * N4 * S4 / best / 1e9:.3f}e9 CUPS  "
      f"mass={F[1:-1, 1:-1].sum():.1f} finite+bounded OK", flush=True)
