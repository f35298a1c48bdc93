"""Bisect the 128^3 compiled-NaN: compare each slab kernel vs its XLA
counterpart on the TPU, and check step-count dependence at 64^3."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpuvof as tv
from tpuvof.config import Fluid
from tpuvof.grid import Grid3D
from tpuvof.solver3d import (
    _pad_jk, _solve_pressure_3d, simulate_3d, step_3d)
from tpuvof.ops import apply_bc_3d, mix_properties
from tpuvof.ops.fct3d import fct3d_sweep_x, fct3d_sweep_y, fct3d_sweep_z
from tpuvof.ops.momentum3d import predict_velocity_3d, update_velocity_3d
from tpuvof.pallas_kernels.step3d import (
    pallas_correct3d, pallas_fct3d_sweep, pallas_predict3d_rhs)
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d

print("backend:", jax.default_backend(), flush=True)

# ---- 64^3, 300 steps: does NaN appear with more steps? ----
g = Grid3D(64, 64, 64)
s = tv.init_state_3d(g, ic=1)
for batch in range(0):
    s = simulate_3d(g, s, 30, backend="pallas")
    F = np.asarray(s.F)
    print(f"64^3 after {(batch+1)*30} steps: finite={np.isfinite(F).all()} "
          f"mass={F[1:-1,1:-1,1:-1].sum():.2f}", flush=True)
    if not np.isfinite(F).all():
        break

# ---- 128^3: per-phase kernel comparisons ----
n = 128
g = Grid3D(n, n, n)
fl = Fluid()
dt = 4e-6
s = tv.init_state_3d(g, ic=1)
s = simulate_3d(g, s, 9, backend="xla")  # a developed state
F, u, v, w, p = (jnp.asarray(x) for x in s)
p1, p2 = _pad_jk(g)
pad = lambda a: jnp.pad(a, ((0, 0), (0, p1), (0, p2)))
unpad = lambda a: a[:, :g.ny + 2, :g.nz + 2]

def diff(name, a, b, region=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if region is not None:
        a, b = a[region], b[region]
    d = np.abs(a - b)
    print(f"  {name}: max|diff|={d.max():.3e} finite={np.isfinite(b).all()}",
          flush=True)

I = (slice(1, -1),) * 3

# predict
rho, nu = mix_properties(fl, F)
kappa = jnp.zeros_like(F)
us_x, vs_x, ws_x = jax.jit(lambda *a: predict_velocity_3d(g, fl, dt, *a))(
    u, v, w, F, rho, nu, kappa)
rhs_x = jnp.zeros_like(F).at[I].set(rho[I] / dt * (
    (us_x[2:, 1:-1, 1:-1] - us_x[I]) * g.dxi
    + (vs_x[1:-1, 2:, 1:-1] - vs_x[I]) * g.dyi
    + (ws_x[1:-1, 1:-1, 2:] - ws_x[I]) * g.dzi))
t0 = time.perf_counter()
us_p, vs_p, ws_p, rhs_p = jax.jit(
    lambda *a: tuple(unpad(x) for x in pallas_predict3d_rhs(g, fl, dt, *a))
)(pad(u), pad(v), pad(w), pad(F))
print(f"predict compiled in {time.perf_counter()-t0:.0f}s", flush=True)
diff("us", us_x, us_p)
diff("vs", vs_x, vs_p)
diff("ws", ws_x, ws_p)
diff("rhs", rhs_x, rhs_p)

# jacobi (use the XLA-produced rhs for isolation)
ub, vb, wb, Fb, pb, rhob = apply_bc_3d(u, v, w, F, p, rho)
p_x = jax.jit(lambda *a: _solve_pressure_3d(g, dt, 10, *a))(
    pb, us_x, vs_x, ws_x, rhob)
t0 = time.perf_counter()
p_p = jax.jit(lambda pp, rr: unpad(pallas_jacobi_3d(g, 10, pad(pp), pad(rr))))(
    pb, rhs_x)
print(f"jacobi compiled in {time.perf_counter()-t0:.0f}s", flush=True)
diff("p", p_x, p_p, I)

# correct
u_x2, v_x2, w_x2 = jax.jit(lambda *a: update_velocity_3d(g, dt, *a))(
    ub, vb, wb, us_x, vs_x, ws_x, p_x, rhob)
t0 = time.perf_counter()
u_p2, v_p2, w_p2 = jax.jit(
    lambda *a: tuple(unpad(x) for x in pallas_correct3d(g, fl, dt, *a))
)(pad(us_x), pad(vs_x), pad(ws_x), pad(p_x), pad(Fb))
print(f"correct compiled in {time.perf_counter()-t0:.0f}s", flush=True)
diff("u", u_x2, v_prev_fix := u_p2, I)
diff("v", v_x2, v_p2, I)
diff("w", w_x2, w_p2, I)

# sweeps
ub2, vb2, wb2, Fb2, pb2 = apply_bc_3d(u_x2, v_x2, w_x2, Fb, p_x)
for name, fx, ax, vel in (("sweep_x", fct3d_sweep_x, 0, ub2),
                          ("sweep_y", fct3d_sweep_y, 1, vb2),
                          ("sweep_z", fct3d_sweep_z, 2, wb2)):
    want = jax.jit(lambda a, b: fx(g, dt, a, b))(Fb2, vel)
    t0 = time.perf_counter()
    got = jax.jit(lambda a, b: unpad(
        pallas_fct3d_sweep(g, dt, pad(a), pad(b), ax)))(Fb2, vel)
    print(f"{name} compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    diff(name, want, got)
print("DONE", flush=True)
