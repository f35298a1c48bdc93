"""Benchmark harness: cell-updates/second at 512^2, 1000-step dam break.

Prints ONE JSON line:
  {"metric": "cell_updates_per_sec_512", "value": ..., "unit": "cells*steps/s",
   "vs_baseline": ...}

The reference publishes no numbers (BASELINE.md); the baseline constant below
is the measured wall-clock of this framework's own XLA:CPU execution of the
identical 512^2 workload on this machine — the stand-in for the Taichi-CPU
reference (which is not installable here), recorded in BASELINE.md.
"""
from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

# Measured on this machine (XLA:CPU, f32, 512^2 x 1000 steps) — see
# BASELINE.md "measured" table. Units: cell-updates/second.
BASELINE_CUPS = 0.0  # filled by scripts/measure_baseline.py; 0 -> remeasure

# Roofline constants of the 2-D mono kernel at 512^2 (VERDICT r4 #8 —
# efficiency, not just CUPS, must be driver-visible). Measured by
# scripts/roofline2d.py and published in BASELINE.md "2-D mono-kernel
# roofline": traced VPU issue slots and FMA=2-model flops per cell-step,
# against the v5p-class peaks (8x128 lanes x 4 ALUs x 0.94 GHz issue;
# x2 for the FMA flop model).
MONO_OPS_PER_CELL_STEP = 401.0     # jaxpr arithmetic ops (issue slots)
MONO_FLOPS_PER_CELL_STEP = 963.0   # XLA cost-analysis flops (FMA=2)
VPU_PEAK_OPS = 3.85e12             # issue slots/s
VPU_PEAK_FLOPS = 7.70e12           # flop/s (FMA model)


def measure(simulate, cfg, state, n_steps: int) -> float:
    """Wall-clock seconds for n_steps, forcing a device sync with a tiny
    host copy (the axon tunnel's block_until_ready can return early; a
    full-field copy inside the timed region would add tunnel-transfer
    time that is not simulation cost)."""
    t0 = time.perf_counter()
    out = simulate(cfg, state, n_steps)
    np.asarray(out.F[:1, :8])
    return time.perf_counter() - t0, out


def run_backend(tv, n, n_steps, backend):
    from tpuvof.solver import effective_backend

    cfg = tv.SimConfig(grid=tv.Grid2D(n, n), num=tv.Numerics(backend=backend))
    state = tv.init_state(cfg, ic=1)
    _, s = measure(tv.simulate, cfg, state, n_steps)  # warmup / compile
    times = []
    for _ in range(3):
        dt, s = measure(tv.simulate, cfg, s, n_steps)
        times.append(dt)
    return min(times), effective_backend(cfg)


def bench_3d_200(tv, n_steps=100):
    """3-D flagship (reference 3dvof.py:20-22): 200^3 dam break on the
    slab-Pallas pipeline. Warm once (the FIRST large execution in a fresh
    process can run 10-30x slow even with cached programs — BASELINE.md),
    then best-of-3. One program: istep0=0 each run."""
    from tpuvof.grid import Grid3D
    from tpuvof.solver3d import init_state_3d, simulate_3d

    g = Grid3D(200, 200, 200)
    state = init_state_3d(g, ic=1)

    def run(s):
        t0 = time.perf_counter()
        out = simulate_3d(g, s, n_steps, backend="pallas")
        np.asarray(out.F[:1, :1, :8])
        return time.perf_counter() - t0, out

    _, s = run(state)  # warmup / compile
    best = min(run(state)[0] for _ in range(3))
    return 200**3 * n_steps / best, best


def bench_2048_beyond_vmem(tv, n_steps=500):
    """Beyond-VMEM-envelope flagship: 2048^2 dam break on whatever engine
    pallas_mono auto-upgrades to there (round 3: the strip-streaming
    engine, one HBM-resident launch per step — 3.13e9 CUPS, 1.7x the
    tiled loop engine it replaced as the default; r2 key name was
    cups_2048_tiled). Program shape matches scripts/tpu_strips_check.py
    so the compile cache is shared."""
    n = 2048
    cfg = tv.SimConfig(grid=tv.Grid2D(n, n),
                       num=tv.Numerics(backend="pallas_mono"))
    state = tv.init_state(cfg, ic=1)

    def run(s):
        t0 = time.perf_counter()
        out = tv.simulate(cfg, s, n_steps)
        np.asarray(out.F[:1, :8])
        return time.perf_counter() - t0, out

    _, s = run(state)  # warmup / compile
    best = min(run(state)[0] for _ in range(3))
    return n * n * n_steps / best, best


def bench_3d_256_streamed(tv, n_steps=100):
    """256^3 3-D flagship beyond round 4's resident envelope (VERDICT r3
    #4). Key name kept for cross-round continuity, but the engine under
    it upgraded in round 5: the single-volume resident Jacobi kernel
    (jacobi3d._kernel streams p's input from HBM instead of paying
    Mosaic's second whole-volume VMEM window) brought 256^3 back inside
    the resident envelope (~264^3 now), replacing the HBM-streamed
    per-iteration Jacobi this key measured in round 4 (1.39e9 CUPS;
    which itself replaced the 0.30e9 whole-step XLA fallback)."""
    from tpuvof.grid import Grid3D
    from tpuvof.solver3d import init_state_3d, simulate_3d

    g = Grid3D(256, 256, 256)
    state = init_state_3d(g, ic=1)

    def run(s):
        t0 = time.perf_counter()
        out = simulate_3d(g, s, n_steps, backend="pallas")
        np.asarray(out.F[:1, :1, :8])
        return time.perf_counter() - t0, out

    _, s = run(state)  # warmup / compile
    best = min(run(state)[0] for _ in range(3))
    return 256**3 * n_steps / best, best


def bench_512_rbsor(tv, n_steps=200):
    """Numerics-upgrade gate (VERDICT r3 #7): 512^2 dam break with the
    residual-driven RB-SOR pressure solver at the config-default tol on
    the HYBRID pallas step (Pallas predict/FCT phase kernels + the XLA
    solve between them). Catches regressions in the upgrade path that the
    fixed-Jacobi keys cannot see. Fewer steps: each step runs a
    to-tolerance solve, ~10x the fixed-10-sweep cost."""
    cfg = tv.SimConfig(grid=tv.Grid2D(512, 512),
                       num=tv.Numerics(backend="pallas",
                                       pressure_solver="rbsor"))
    state = tv.init_state(cfg, ic=1)

    def run(s):
        t0 = time.perf_counter()
        out = tv.simulate(cfg, s, n_steps)
        np.asarray(out.F[:1, :8])
        return time.perf_counter() - t0, out

    _, s = run(state)  # warmup / compile
    best = min(run(state)[0] for _ in range(3))
    return 512 * 512 * n_steps / best, best


def bench_512_mg_rel(tv, n_steps=200):
    """Bounded-cost numerics upgrade (round 4, Numerics.sor_tol_rel):
    512^2 dam break with geometric multigrid solved to a RELATIVE
    residual target (1% of each step's divergence-source scale) on the
    HYBRID pallas step. This is the production setting BASELINE.md's
    round-4 lesson recommends (an absolute tol is unreachable at flow
    scale, so the absolute-default rbsor/mg cells run to their caps);
    a regression in the relative-stop path or mg's cycle count moves
    this key."""
    cfg = tv.SimConfig(grid=tv.Grid2D(512, 512),
                       num=tv.Numerics(backend="pallas",
                                       pressure_solver="mg",
                                       sor_tol=0.0, sor_tol_rel=1e-2,
                                       sor_max_iter=50))
    state = tv.init_state(cfg, ic=1)

    def run(s):
        t0 = time.perf_counter()
        out = tv.simulate(cfg, s, n_steps)
        np.asarray(out.F[:1, :8])
        return time.perf_counter() - t0, out

    _, s = run(state)  # warmup / compile
    best = min(run(state)[0] for _ in range(3))
    return 512 * 512 * n_steps / best, best


def bench_dist_512(tv, n_steps=1000):
    """Distributed machinery tax gate: 512^2 dam break through Decomp on a
    1x1 mesh (windowed per-shard kernel), device-resident blocked state."""
    import jax
    from jax.sharding import Mesh
    from tpuvof.parallel import Decomp

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
    cfg = tv.SimConfig(grid=tv.Grid2D(512, 512),
                       num=tv.Numerics(backend="pallas_mono"))
    dec = Decomp(cfg, mesh)
    blocked = dec.scatter_state(tv.init_state(cfg, ic=1))
    run_fn = dec.make_simulate()

    def run(b):
        t0 = time.perf_counter()
        out = run_fn(b, n_steps)
        np.asarray(out.F[:1, :8])
        return time.perf_counter() - t0, out

    _, b = run(blocked)  # warmup / compile
    best = min(run(blocked)[0] for _ in range(3))
    return 512 * 512 * n_steps / best, best


def bench_dist_mg_rel(tv, n_steps=200):
    """Distributed HYBRID production gate (VERDICT r4 #1): 512^2 dam
    break through Decomp on a 1x1 mesh with mg + sor_tol_rel=1e-2 and
    backend='pallas' — routes to _local_step_hybrid (per-shard Pallas
    predict/FCT phase kernels around the distributed solve). Target:
    within ~20% of the serial hybrid (cups_512_mg_rel1e2)."""
    import jax
    from jax.sharding import Mesh
    from tpuvof.parallel import Decomp

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("mx", "my"))
    cfg = tv.SimConfig(grid=tv.Grid2D(512, 512),
                       num=tv.Numerics(backend="pallas",
                                       pressure_solver="mg",
                                       sor_tol=0.0, sor_tol_rel=1e-2,
                                       sor_max_iter=50))
    dec = Decomp(cfg, mesh)
    if not dec.hybrid_shard_supported():
        raise RuntimeError("hybrid phase kernels must be in play")
    blocked = dec.scatter_state(tv.init_state(cfg, ic=1))
    run_fn = dec.make_simulate()

    def run(b):
        t0 = time.perf_counter()
        out = run_fn(b, n_steps)
        np.asarray(out.F[:1, :8])
        return time.perf_counter() - t0, out

    _, b = run(blocked)  # warmup / compile
    best = min(run(blocked)[0] for _ in range(3))
    return 512 * 512 * n_steps / best, best


def main():
    import jax
    import tpuvof as tv

    n = 512
    n_steps = 1000
    backends = ["xla"]
    if jax.default_backend() != "cpu":
        backends += ["pallas", "pallas_mono"]
    results = {}
    ran = {}
    for backend in backends:
        try:
            results[backend], ran[backend] = run_backend(tv, n, n_steps, backend)
        except Exception:
            # a broken fused path must be VISIBLE, not silently absorbed
            # into the XLA number (VERDICT r1 #6)
            print(f"bench: backend {backend!r} FAILED:", file=sys.stderr)
            traceback.print_exc()
    if not results:
        print("bench: EVERY backend failed; see tracebacks above",
              file=sys.stderr)
        return 1
    backend = min(results, key=results.get)
    best = results[backend]
    cups = n * n * n_steps / best

    # %-of-peak keys (VERDICT r4 #8): sustained VPU issue / FMA-model
    # flop rates of the mono kernel against the hardware peaks, derived
    # from the same timing as the headline. Only meaningful for the
    # single-kernel engine, so they key off pallas_mono's time.
    efficiency = {}
    if "pallas_mono" in results:
        mono_cups = n * n * n_steps / results["pallas_mono"]
        efficiency = {
            "vpu_issue_pct_512": round(
                100 * mono_cups * MONO_OPS_PER_CELL_STEP / VPU_PEAK_OPS, 1),
            "mfu_fma_pct_512": round(
                100 * mono_cups * MONO_FLOPS_PER_CELL_STEP / VPU_PEAK_FLOPS,
                1),
        }

    # flagship coverage beyond the 512^2 headline (VERDICT r2 #5): the
    # 3-D 200^3 slab-pallas and distributed-1x1 numbers become
    # driver-visible so a regression there moves BENCH_r{N}, not just a
    # hand-run sweep file. TPU-only (the CPU stand-in would take hours).
    extras = {}
    if jax.default_backend() != "cpu":
        for key, fn in (("cups_3d_200_pallas", bench_3d_200),
                        ("cups_dist_512_1x1", bench_dist_512),
                        ("cups_2048_strips", bench_2048_beyond_vmem),
                        ("cups_512_rbsor", bench_512_rbsor),
                        ("cups_512_mg_rel1e2", bench_512_mg_rel),
                        ("cups_dist_mg_rel1e2", bench_dist_mg_rel),
                        ("cups_3d_256_streamed", bench_3d_256_streamed)):
            try:
                cups_x, secs_x = fn(tv)
                extras[key] = round(cups_x, 1)
                extras[key + "_seconds"] = round(secs_x, 4)
            except Exception:
                print(f"bench: extra workload {key!r} FAILED:",
                      file=sys.stderr)
                traceback.print_exc()
                extras[key] = None

    baseline = BASELINE_CUPS
    if not baseline:
        try:
            with open("BASELINE_MEASURED.json") as f:
                baseline = json.load(f)["cell_updates_per_sec_512_cpu"]
        except Exception:
            baseline = float("nan")

    print(
        json.dumps(
            {
                "metric": "cell_updates_per_sec_512",
                "value": round(cups, 1),
                "unit": "cells*steps/s",
                "vs_baseline": round(cups / baseline, 3) if baseline == baseline else None,
                # Taichi is not installable here; the baseline is this
                # framework's own XLA:CPU run of the identical workload
                # (BASELINE.md "measured" table)
                "baseline_kind": "self_xla_cpu",
                "backend": backend,
                "backend_effective": ran[backend],
                "per_backend_seconds": {
                    k: round(v, 4) for k, v in sorted(results.items())
                },
                "seconds_per_1000_steps": round(best, 4),
                **efficiency,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main() or 0)
