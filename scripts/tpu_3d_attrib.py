"""In-process cost attribution for the 3-D pallas step at 200^3.

The standalone per-phase profile (tpu_3d_profile.py, removed) proved vulnerable to
degraded-TPU windows (one run measured 122 ms/step while simulate_3d did
5.1 ms in the same hour). Here every variant is timed in ONE process,
back-to-back, against the same baseline, so only RELATIVE numbers are
used: full step, BC-free step, 1-iteration Jacobi, sweep-free step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.config import Fluid
from tpuvof.solver3d import (
    _apply_bc_3d_win,
    _pad_jk,
    _SWEEP_ORDER,
)
from tpuvof.state import State3D
from tpuvof.pallas_kernels.step3d import (
    pallas_correct3d,
    pallas_fct3d_sweep,
    pallas_predict3d_rhs,
)
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "200"))
STEPS = 30
g = Grid3D(N, N, N)
fl = Fluid()
dt = 4e-6

s = tv.init_state_3d(g, ic=1)
p1, p2 = _pad_jk(g)
pad = lambda a: jnp.pad(a, ((0, 0), (0, p1), (0, p2)))  # noqa: E731
sp = tuple(pad(a) for a in s)  # F,u,v,w,p


def make_step(n_jac=10, do_bc=False, do_sweeps=True, do_predict=True,
              do_correct=True):
    """Mirrors solver3d._step_3d_pallas_padded (in-kernel BCs, mirror_out
    on the last sweep); do_bc adds the RETIRED whole-volume XLA pass back
    for comparison."""
    def step(st, phase):
        F, u, v, w, p = st
        if do_predict:
            us, vs, ws, rhs = pallas_predict3d_rhs(g, fl, dt, u, v, w, F)
            p = pallas_jacobi_3d(g, n_jac, p, rhs)
            if do_correct:
                u, v, w = pallas_correct3d(g, fl, dt, us, vs, ws, p, F)
        if do_sweeps:
            vels = (u, v, w)
            for idx, ax in enumerate(_SWEEP_ORDER[phase]):
                F = pallas_fct3d_sweep(g, dt, F, vels[ax], ax,
                                       mirror_out=(idx == 2))
        if do_bc:
            u, v, w, F, p = _apply_bc_3d_win(g, u, v, w, F, p)
        return State3D(F=F, u=u, v=v, w=w, p=p)

    @jax.jit
    def run(s5):
        st = State3D(*s5)

        def body(st, _):
            for ph in (1, 2, 0):
                st = step(tuple(st), ph)
            return st, None

        st, _ = jax.lax.scan(body, st, None, length=STEPS // 3)
        return tuple(st)

    return run


def t(name, fn):
    t0 = time.perf_counter()
    out = fn(sp)
    np.asarray(out[0][:1, :1, :8])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(sp)
        np.asarray(out[0][:1, :1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    ms = best / STEPS * 1e3
    print(f"{name:28s}: {ms:7.3f} ms/step  (compile {c:.1f}s)", flush=True)
    return ms


full = t("full step (production)", make_step())
withbc = t("with retired XLA BC", make_step(do_bc=True))
jac1 = t("jacobi n=1", make_step(n_jac=1))
nosweep = t("no sweeps", make_step(do_sweeps=False))
nocorr = t("no correct", make_step(do_correct=False, do_sweeps=False))
nopredict = t("sweeps only", make_step(do_predict=False))
full2 = t("full step (re-run)", make_step())

print(f"\nretired BC would cost: {withbc - full:6.3f} ms", flush=True)
print(f"9 jacobi iters : {full - jac1:6.3f} ms -> {(full-jac1)/9*10:6.3f} ms for 10", flush=True)
print(f"3 sweeps       : {full - nosweep:6.3f} ms", flush=True)
print(f"correct        : {nosweep - nocorr:6.3f} ms", flush=True)
print(f"predict+jac+cor: {full - nopredict:6.3f} ms", flush=True)
print(f"env drift check: full {full:.3f} vs re-run {full2:.3f}", flush=True)
