"""Grid x backend benchmark sweep (VERDICT r1 #9).

Measures the wall-clock and cell-updates/s of every (workload, backend)
cell that BASELINE.md's measured table hand-maintains, and emits one JSON
line per cell plus a summary table. Run on the TPU:

    python benchmarks/sweep.py                 # full sweep
    python benchmarks/sweep.py --quick         # 256^2/512^2 + 128^3 only
    python benchmarks/sweep.py --out sweep.json

Fresh Mosaic compiles of new shapes can take minutes (cached across
processes afterwards) — run detached the first time.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(run, *args):
    t0 = time.perf_counter()
    out = run(*args)
    # force a device sync with a TINY host copy: block_until_ready can
    # return early over axon, but pulling the whole field through the
    # tunnel inside the timed region added ~8 ms/step of artifact for
    # 33 MB 3-D volumes (BASELINE.md round-2 note)
    np.asarray(out.F[:1, :1])
    return time.perf_counter() - t0, out


def bench_2d(tv, n, steps, backend, reps=3):
    from tpuvof.solver import effective_backend

    cfg = tv.SimConfig(grid=tv.Grid2D(n, n), num=tv.Numerics(backend=backend))
    s = tv.init_state(cfg, ic=1)
    _, s = _time(tv.simulate, cfg, s, steps)  # compile + warm
    best = min(_time(tv.simulate, cfg, s, steps)[0] for _ in range(reps))
    return best, effective_backend(cfg)


def bench_3d(tv, n, steps, backend, reps=3):
    from tpuvof.solver3d import pallas3d_supported, simulate_3d
    from tpuvof.grid import Grid3D

    g = Grid3D(n, n, n)
    s = tv.init_state_3d(g, ic=1)
    run = lambda st: simulate_3d(g, st, steps, backend=backend)  # noqa: E731
    _, s = _time(run, s)
    best = min(_time(run, s)[0] for _ in range(reps))
    eff = backend if (backend == "xla" or pallas3d_supported(g)) else "xla"
    return best, eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="benchmarks/sweep_results.json")
    ap.add_argument("--steps2d", type=int, default=1000)
    ap.add_argument("--steps3d", type=int, default=100)
    args = ap.parse_args()

    import jax
    import tpuvof as tv

    on_tpu = jax.default_backend() != "cpu"
    # 2048^2 exceeds the whole-field VMEM envelope: pallas_mono routes to
    # the tiled engine there (effective backend 'pallas_tiled')
    grids_2d = [256, 512] if args.quick else [256, 512, 1024, 2048]
    grids_3d = [128] if args.quick else [128, 200]
    backends_2d = ["xla"] + (["pallas", "pallas_mono"] if on_tpu else [])
    backends_3d = ["xla"] + (["pallas"] if on_tpu else [])

    rows = []
    for n in grids_2d:
        for backend in backends_2d:
            try:
                secs, eff = bench_2d(tv, n, args.steps2d, backend)
            except Exception as e:  # visible, never silent (VERDICT r1 #6)
                print(json.dumps({"workload": f"{n}^2", "backend": backend,
                                  "error": repr(e)}), flush=True)
                continue
            row = {
                "workload": f"{n}^2 dam break x{args.steps2d}",
                "backend": backend, "backend_effective": eff,
                "seconds": round(secs, 4),
                "cups": round(n * n * args.steps2d / secs, 1),
                "baseline_kind": "self_xla_cpu",
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    for n in grids_3d:
        for backend in backends_3d:
            try:
                secs, eff = bench_3d(tv, n, args.steps3d, backend)
            except Exception as e:
                print(json.dumps({"workload": f"{n}^3", "backend": backend,
                                  "error": repr(e)}), flush=True)
                continue
            row = {
                "workload": f"{n}^3 dam break x{args.steps3d}",
                "backend": backend, "backend_effective": eff,
                "seconds": round(secs, 4),
                "cups": round(n ** 3 * args.steps3d / secs, 1),
                "baseline_kind": "self_xla_cpu",
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump({"platform": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print(f"\n{'workload':32s} {'backend':12s} {'eff':12s} "
          f"{'seconds':>9s} {'CUPS':>12s}")
    for r in rows:
        print(f"{r['workload']:32s} {r['backend']:12s} "
              f"{r['backend_effective']:12s} {r['seconds']:9.4f} "
              f"{r['cups']:12.3e}")


if __name__ == "__main__":
    main()
