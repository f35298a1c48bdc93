"""V-cycle smoothing-count A/B in the bounded-cost production regime.

mg_solve defaults to V(2,2) (nu=2 pre+post sweeps). In the per-step
warm-started sor_tol_rel mode the solve runs only 1-3 cycles to the
relative target, so halving the per-cycle smoothing (V(1,1)) trades
cycle count against sweep count — which way it nets out is an empirical
question this script answers on the chip (one process, back-to-back,
best-of-REPS, tiny-slice syncs; the nu override rides a monkeypatch of
tpuvof.ops.mg.mg_solve's default, which every caller late-imports).

Usage: python scripts/tpu_mg_nu_ab.py    env STEPS2D/STEPS3D/REPS
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import tpuvof as tv
import tpuvof.ops.mg as mgmod
from tpuvof.grid import Grid3D
from tpuvof.solver3d import simulate_3d

print("backend:", jax.default_backend(), flush=True)

STEPS2D = int(os.environ.get("STEPS2D", "1000"))
STEPS3D = int(os.environ.get("STEPS3D", "100"))
REPS = int(os.environ.get("REPS", "3"))
REL = float(os.environ.get("REL", "1e-2"))

_orig = mgmod.mg_solve


def set_nu(nu):
    if nu is None:
        mgmod.mg_solve = _orig
    else:
        mgmod.mg_solve = functools.partial(_orig, nu=nu)


def cups2d(label, nu, max_iter):
    # CAUTION: the jitted driver caches on STATIC args only — the nu
    # monkeypatch changes the trace, not the cache key, so each variant
    # must carry a distinct (semantically inert: the cap is never hit in
    # the rel regime) sor_max_iter to force a fresh trace.
    set_nu(nu)
    num = tv.Numerics(backend="pallas", pressure_solver="mg",
                      sor_tol=0.0, sor_tol_rel=REL, sor_max_iter=max_iter)
    cfg = tv.SimConfig(grid=tv.Grid2D(512, 512), num=num)
    s0 = tv.init_state(cfg, ic=1)
    s = tv.simulate(cfg, s0, STEPS2D)
    np.asarray(s.F[:1, :1])
    best = None
    out = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = tv.simulate(cfg, s0, STEPS2D)
        np.asarray(out.F[:1, :1])
        best = min(best or 1e9, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out.F)).all(), label
    c = 512 * 512 * STEPS2D / best
    print(f"{label:28s}: best {best:.3f}s -> {c / 1e9:.3f}e9 CUPS",
          flush=True)
    set_nu(None)
    return c


def cups3d(label, nu, max_iter):
    set_nu(nu)
    g = Grid3D(200, 200, 200)
    s0 = tv.init_state_3d(g, ic=1)
    kw = dict(backend="pallas", pressure_solver="mg", sor_tol=0.0,
              sor_tol_rel=REL, sor_max_iter=max_iter)
    s = simulate_3d(g, s0, STEPS3D, **kw)
    np.asarray(s.F[:1, :1, :8])
    best = None
    out = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = simulate_3d(g, s0, STEPS3D, istep0=0, **kw)
        np.asarray(out.F[:1, :1, :8])
        best = min(best or 1e9, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(out.F)).all(), label
    c = 200 ** 3 * STEPS3D / best
    print(f"{label:28s}: best {best:.3f}s -> {c / 1e9:.3f}e9 CUPS",
          flush=True)
    set_nu(None)
    return c


out = {}
out["2d_nu2"] = cups2d("2d 512^2 mg rel V(2,2)", None, 50)
out["2d_nu1"] = cups2d("2d 512^2 mg rel V(1,1)", 1, 49)
out["2d_nu3"] = cups2d("2d 512^2 mg rel V(3,3)", 3, 48)
out["2d_nu2_re"] = cups2d("2d 512^2 mg rel V(2,2) re", None, 50)
out["3d_nu2"] = cups3d("3d 200^3 mg rel V(2,2)", None, 50)
out["3d_nu1"] = cups3d("3d 200^3 mg rel V(1,1)", 1, 49)

print("\nsummary:", {k: f"{v/1e9:.3f}e9" for k, v in out.items()},
      flush=True)
