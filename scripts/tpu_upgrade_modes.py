"""TPU cost of the round-4 upgrade modes (VERDICT r3 #1d/#3).

Measures, back-to-back in ONE process (CLAUDE.md: degraded-TPU windows):
  2-D 512^2  : jacobi/pallas (baseline re-run), rbsor/HYBRID pallas,
               rbsor/xla (what the r3 silent downgrade used to cost)
  3-D 200^3  : csf=False pallas (baseline re-run), csf=True pallas
               (in-kernel normals+curvature), rbsor/HYBRID pallas
The rbsor cells run the config-default solve (sor_tol=1e-3,
sor_max_iter=200) — the production upgrade setting, not a tight-tol
study (that's scripts/tpu_mg_ab.py). Baselines re-run FIRST and the 2-D
baseline repeats at the END as the env-drift check.

Run detached (fresh Mosaic compiles of the hybrid/csf programs).
Usage: python scripts/tpu_upgrade_modes.py   env STEPS2D=1000 STEPS3D=100
"""
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

STEPS2D = int(os.environ.get("STEPS2D", "1000"))
STEPS3D = int(os.environ.get("STEPS3D", "100"))
REPS = int(os.environ.get("REPS", "3"))
# run a subset (comma list of the out{} keys); empty = all. One TPU-side
# crash must not take down the whole sweep (the 3d_200_rbsor_hybrid cell
# killed the worker once, round 4).
CELLS = set(filter(None, os.environ.get("CELLS", "").split(",")))


def want(key):
    return not CELLS or key in CELLS


def cups2d(label, n, backend, solver, steps=None, tol_rel=0.0):
    steps = steps or STEPS2D
    # tol_rel > 0 = the bounded-cost production mode (sor_tol_rel; the
    # absolute default is unreachable for rhs ~ 1e8, so those cells run
    # to the cap/floor every step — the round-4 'honest lesson' cells)
    num = tv.Numerics(backend=backend, pressure_solver=solver,
                      sor_tol=0.0 if tol_rel else 1e-3,
                      sor_tol_rel=tol_rel)
    cfg = tv.SimConfig(grid=tv.Grid2D(n, n), num=num)
    s = tv.init_state(cfg, ic=1)
    t0 = time.perf_counter()
    s = tv.simulate(cfg, s, steps)
    np.asarray(s.F[:1, :1])
    comp = time.perf_counter() - t0
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = tv.simulate(cfg, s, steps, istep0=0)
        np.asarray(s.F[:1, :1])
        best = min(best or 1e9, time.perf_counter() - t0)
    c = n * n * steps / best
    assert np.isfinite(np.asarray(s.F)).all(), label
    print(f"{label:34s}: compile {comp:6.1f}s  best {best:.3f}s "
          f"-> {c / 1e9:.3f}e9 CUPS", flush=True)
    return c


def cups3d(label, n, backend, solver="jacobi", csf=False, steps=None,
           tol_rel=0.0):
    steps = steps or STEPS3D
    g = Grid3D(n, n, n)
    s = tv.init_state_3d(g, ic=1)
    kw = dict(backend=backend, pressure_solver=solver, csf=csf)
    if tol_rel:
        kw.update(sor_tol=0.0, sor_tol_rel=tol_rel)
    t0 = time.perf_counter()
    s = simulate_3d(g, s, steps, **kw)
    np.asarray(s.F[:1, :1, :8])
    comp = time.perf_counter() - t0
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = simulate_3d(g, s, steps, istep0=0, **kw)
        np.asarray(s.F[:1, :1, :8])
        best = min(best or 1e9, time.perf_counter() - t0)
    c = n ** 3 * steps / best
    assert np.isfinite(np.asarray(s.F)).all(), label
    print(f"{label:34s}: compile {comp:6.1f}s  best {best:.3f}s "
          f"-> {c / 1e9:.3f}e9 CUPS", flush=True)
    return c


out = {}
cells2d = (
    # baselines first (warm the process; also the reference points)
    ("2d_512_jacobi_mono", "2d 512^2 jacobi pallas(mono)", "pallas",
     "jacobi", None),
    # the upgrade modes
    ("2d_512_rbsor_hybrid", "2d 512^2 rbsor HYBRID pallas", "pallas",
     "rbsor", None),
    ("2d_512_rbsor_xla", "2d 512^2 rbsor xla", "xla", "rbsor", None),
    ("2d_512_mg_hybrid", "2d 512^2 mg HYBRID pallas", "pallas", "mg",
     None),
)
cells3d = (
    ("3d_200_jacobi_pallas", "3d 200^3 jacobi pallas", "pallas",
     "jacobi", False, None),
    ("3d_200_csf_pallas", "3d 200^3 csf pallas", "pallas", "jacobi",
     True, None),
    ("3d_200_mg_hybrid", "3d 200^3 mg HYBRID pallas", "pallas", "mg",
     False, None),
    # LAST among the hybrid cells: this one killed the TPU worker once
    ("3d_200_rbsor_hybrid", "3d 200^3 rbsor HYBRID pallas", "pallas",
     "rbsor", False, None),
    ("3d_200_csf_xla", "3d 200^3 csf xla (r3 fallback)", "xla", "jacobi",
     True, 20),
)
for key, label, backend, solver, steps in cells2d[:1]:
    if want(key):
        out[key] = cups2d(label, 512, backend, solver, steps)
for key, label, backend, solver, csf, steps in cells3d[:1]:
    if want(key):
        out[key] = cups3d(label, 200, backend, solver, csf, steps)
for key, label, backend, solver, steps in cells2d[1:]:
    if want(key):
        out[key] = cups2d(label, 512, backend, solver, steps)
for key, label, backend, solver, csf, steps in cells3d[1:]:
    if want(key):
        out[key] = cups3d(label, 200, backend, solver, csf, steps)

# bounded-cost production cells (sor_tol_rel=1e-2: reduce each step's
# divergence residual to 1% of its source scale — converged projection at
# O(1) warm-started cycles/sweeps per step)
for key, label, backend, solver, rel in (
    ("2d_512_mg_rel1e2", "2d 512^2 mg HYBRID rel=1e-2", "pallas", "mg",
     1e-2),
    ("2d_512_rbsor_rel1e2", "2d 512^2 rbsor HYBRID rel=1e-2", "pallas",
     "rbsor", 1e-2),
    ("2d_512_mg_rel1e1", "2d 512^2 mg HYBRID rel=1e-1", "pallas", "mg",
     1e-1),
):
    if want(key):
        out[key] = cups2d(label, 512, backend, solver, tol_rel=rel)
for key, label, backend, solver, rel in (
    ("3d_200_mg_rel1e2", "3d 200^3 mg HYBRID rel=1e-2", "pallas", "mg",
     1e-2),
    ("3d_200_rbsor_rel1e2", "3d 200^3 rbsor HYBRID rel=1e-2", "pallas",
     "rbsor", 1e-2),
):
    if want(key):
        out[key] = cups3d(label, 200, backend, solver, tol_rel=rel)

# env-drift check
if want("2d_512_jacobi_mono_recheck"):
    out["2d_512_jacobi_mono_recheck"] = cups2d(
        "2d 512^2 jacobi pallas (recheck)", 512, "pallas", "jacobi")

print("\nsummary (CUPS):", flush=True)
for k, v in out.items():
    print(f"  {k:28s} {v / 1e9:.3f}e9", flush=True)
