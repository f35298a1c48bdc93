"""Per-phase TPU timing of the slab-tiled 3-D Pallas step at 200^3.

Times each phase of _step_3d_pallas_padded in isolation (scan-amortized,
forced host copy) to locate where the 18 ms/step goes: the Pallas kernels'
HBM traffic says ~2 ms at spec bandwidth, so something else dominates —
prime suspect is the XLA surface-BC passes (30 dynamic-update-slices on
43 MB volumes, three times per step).

Run detached: fresh Mosaic/XLA compiles through the relay can take minutes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.config import Fluid
from tpuvof.solver3d import (
    _apply_bc_3d_win,
    _pad_jk,
    _step_3d_pallas_padded,
)
from tpuvof.pallas_kernels.step3d import (
    pallas_correct3d,
    pallas_fct3d_sweep,
    pallas_predict3d_rhs,
)
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "200"))
REPS = int(os.environ.get("REPS", "30"))
g = Grid3D(N, N, N)
fl = Fluid()
dt = 4e-6

state = tv.init_state_3d(g, ic=1)
p1, p2 = _pad_jk(g)
pad = lambda a: jnp.pad(a, ((0, 0), (0, p1), (0, p2)))
F, u, v, w, p = (pad(a) for a in state)
shape = F.shape
print("padded shape:", shape, "->",
      f"{np.prod(shape) * 4 / 2**20:.1f} MB/field", flush=True)


def bench(name, fn, *args):
    """fn(*args) -> pytree; scan REPS times feeding nothing back (args are
    closed over), time amortized."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        dtm = time.perf_counter() - t0
        best = dtm if best is None else min(best, dtm)
    ms = best / REPS * 1e3
    print(f"{name:26s}: {ms:8.3f} ms/apply   "
          f"(compile {compile_s:.1f}s, {REPS} reps {best:.3f}s)", flush=True)
    return ms


# --- full step, for reference ---
@jax.jit
def full_step(s5):
    from tpuvof.state import State3D
    st = State3D(*s5)

    def body(st, _):
        for ph in (1, 2, 0):
            st = _step_3d_pallas_padded(g, fl, dt, 10, st, ph)
        return st, None

    st, _ = jax.lax.scan(body, st, None, length=REPS // 3)
    return tuple(st)


# --- predict only ---
@jax.jit
def predict_only(u, v, w, F):
    def body(c, _):
        u, v, w, F = c
        us, vs, ws, rhs = pallas_predict3d_rhs(g, fl, dt, u, v, w, F)
        return (us, vs, ws, rhs), None

    c, _ = jax.lax.scan(body, (u, v, w, F), None, length=REPS)
    return c


# --- bc only ---
@jax.jit
def bc_only(u, v, w, F, p):
    def body(c, _):
        return _apply_bc_3d_win(g, *c), None

    c, _ = jax.lax.scan(body, (u, v, w, F, p), None, length=REPS)
    return c


# --- jacobi only ---
@jax.jit
def jacobi_only(p, rhs):
    def body(p, _):
        return pallas_jacobi_3d(g, 10, p, rhs), None

    p, _ = jax.lax.scan(body, p, None, length=REPS)
    return p


# --- correct only ---
@jax.jit
def correct_only(us, vs, ws, p, F):
    def body(c, _):
        us, vs, ws = c
        return pallas_correct3d(g, fl, dt, us, vs, ws, p, F), None

    c, _ = jax.lax.scan(body, (us, vs, ws), None, length=REPS)
    return c


# --- fct sweep per axis ---
@partial(jax.jit, static_argnums=(2,))
def fct_only(F, vel, axis):
    def body(F, _):
        return pallas_fct3d_sweep(g, dt, F, vel, axis), None

    F, _ = jax.lax.scan(body, F, None, length=REPS)
    return F


rhs = jnp.zeros_like(p)
# full_step runs REPS//3 triples = REPS steps, so bench's /REPS is per step
full_ms = bench("full step", full_step, (F, u, v, w, p))
pred_ms = bench("predict+rhs", predict_only, u, v, w, F)
bc_ms = bench("apply_bc (x1)", bc_only, u, v, w, F, p)
jac_ms = bench("jacobi x10", jacobi_only, p, rhs)
cor_ms = bench("correct", correct_only, u, v, w, p, F)
fx_ms = bench("fct x-sweep", fct_only, F, u, 0)
fy_ms = bench("fct y-sweep", fct_only, F, v, 1)
fz_ms = bench("fct z-sweep", fct_only, F, w, 2)

parts = pred_ms + 3 * bc_ms + jac_ms + cor_ms + fx_ms + fy_ms + fz_ms
print(f"\nsum of parts: {parts:.3f} ms vs full step {full_ms:.3f} ms",
      flush=True)
print(f"BC share (3x): {3 * bc_ms:.3f} ms", flush=True)
