"""A/B: collapsed Youngs corner-gradient sums in the 2-D mono kernel.

_predict_body computes 8 corner gradients (mx1..4, my1..4) and averages
them (reference 2dvof.py get_normal_young's literal form). Algebraically
the average collapses to two 6-term 3x3 stencils (the f(0,*) terms cancel
in mxsum; the my sum pairs into 3 column differences):

  mxsum = -inv2dx/4 * [ (f(1,1)+2f(1,0)+f(1,-1)) - (f(-1,1)+2f(-1,0)+f(-1,-1)) ]
  mysum = -inv2dy/4 * [ (f(1,1)-f(1,-1)) + 2(f(0,1)-f(0,-1)) + (f(-1,1)-f(-1,-1)) ]

— ~27 fewer VPU ops/cell of the step's 401 (scripts/tpu_2d_attrib.py).
NOT bit-identical (FP reassociation, ~1e-7 relative at f32); the A/B
validates closeness then times production vs variant mono kernels
in-scan, one process. Adopt only on a clear win (CLAUDE.md golden pins
tolerate reassociation: f64 drift per step ~1e-16, amplification over
1000 steps measured ~30x in round 2's f32 study).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

import tpuvof as tv
from tpuvof.ops import apply_bc
from tpuvof.ops.common import clamp01
from tpuvof.pallas_kernels import step_kernels as sk

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "512"))
STEPS = 500
cfg = tv.SimConfig(grid=tv.Grid2D(N, N))


def _predict_body_collapsed(cfg, u, v, F, oi=0, oj=0):
    """_predict_body with mxsum/mysum computed via the collapsed stencils;
    everything else identical (same _sh shifts, same masks)."""
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    shape = F.shape
    dt = nm.dt
    dxi, dyi = g.dxi, g.dyi
    from tpuvof.ops import mix_properties

    rho, nu = mix_properties(fl, F)
    interior = sk._region(shape, 1, g.nx + 1, 1, g.ny + 1, oi, oj)
    inv2dx = 1.0 / (2.0 * g.dx)
    inv2dy = 1.0 / (2.0 * g.dy)
    _sh = sk._sh

    def f(di, dj):
        return _sh(F, di, dj)

    mxsum = (-inv2dx * 0.25) * (
        (f(1, 1) + 2.0 * f(1, 0) + f(1, -1))
        - (f(-1, 1) + 2.0 * f(-1, 0) + f(-1, -1))
    )
    mysum = (-inv2dy * 0.25) * (
        (f(1, 1) - f(1, -1))
        + 2.0 * (f(0, 1) - f(0, -1))
        + (f(-1, 1) - f(-1, -1))
    )

    degenerate = (jnp.abs(mxsum) < 1e-10) & (jnp.abs(mysum) < 1e-10)
    mag_sq = mxsum * mxsum + mysum * mysum
    safe_mag = jnp.sqrt(jnp.where(degenerate, 1.0, mag_sq))
    mx = jnp.where(interior, jnp.where(degenerate, mxsum, mxsum / safe_mag),
                   0.0)
    my = jnp.where(interior, jnp.where(degenerate, mysum, mysum / safe_mag),
                   0.0)
    kappa = jnp.where(
        interior,
        -(inv2dx * (_sh(mx, 1, 0) - _sh(mx, -1, 0))
          + inv2dy * (_sh(my, 0, 1) - _sh(my, 0, -1))),
        0.0,
    )

    v_here = 0.25 * (_sh(v, -1, 0) + _sh(v, -1, 1) + v + _sh(v, 0, 1))
    dudx = jnp.where(u > 0, (u - _sh(u, -1, 0)) * dxi, (_sh(u, 1, 0) - u) * dxi)
    dudy = jnp.where(v_here > 0, (u - _sh(u, 0, -1)) * dyi,
                     (_sh(u, 0, 1) - u) * dyi)
    kap_u = (kappa + _sh(kappa, -1, 0)) * 0.5
    fx_kappa = -fl.sigma * (F - _sh(F, -1, 0)) * kap_u / g.dx
    us = u + dt * (
        nu * (_sh(u, -1, 0) - 2.0 * u + _sh(u, 1, 0)) * dxi**2
        + nu * (_sh(u, 0, -1) - 2.0 * u + _sh(u, 0, 1)) * dyi**2
        - u * dudx - v_here * dudy + fl.gx
        + fx_kappa * 2.0 / (rho + _sh(rho, -1, 0))
    )
    u_here = 0.25 * (_sh(u, 0, -1) + u + _sh(u, 1, -1) + _sh(u, 1, 0))
    dvdx = jnp.where(u_here > 0, (v - _sh(v, -1, 0)) * dxi,
                     (_sh(v, 1, 0) - v) * dxi)
    dvdy = jnp.where(v > 0, (v - _sh(v, 0, -1)) * dyi, (_sh(v, 0, 1) - v) * dyi)
    kap_v = (kappa + _sh(kappa, 0, -1)) * 0.5
    fy_kappa = -fl.sigma * (F - _sh(F, 0, -1)) * kap_v / g.dy
    vs = v + dt * (
        nu * (_sh(v, -1, 0) - 2.0 * v + _sh(v, 1, 0)) * dxi**2
        + nu * (_sh(v, 0, -1) - 2.0 * v + _sh(v, 0, 1)) * dyi**2
        - u_here * dvdx - v * dvdy + fl.gy
        + fy_kappa * 2.0 / (rho + _sh(rho, 0, -1))
    )
    us = jnp.where(sk._region(shape, 2, g.nx + 1, 1, g.ny + 1, oi, oj), us, 0.0)
    vs = jnp.where(sk._region(shape, 1, g.nx + 1, 2, g.ny + 1, oi, oj), vs, 0.0)
    return us, vs, rho


def _fullstep_kernel_v(F_ref, u_ref, v_ref, p_ref,
                       F_out, u_out, v_out, p_out,
                       *, cfg, even_step, predict_body):
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    F = F_ref[:]
    u = u_ref[:]
    v = v_ref[:]
    shape = F.shape
    dt = nm.dt
    us, vs, rho = predict_body(cfg, u, v, F)
    rhs = (
        rho[1:-1, 1:-1] / dt
        * ((us[2:, 1:-1] - us[1:-1, 1:-1]) * g.dxi
           + (vs[1:-1, 2:] - vs[1:-1, 1:-1]) * g.dyi)
    )
    ae, aw, an, a_s, ap_inv = sk._inline_poisson_coeffs(g, p_ref.dtype)
    p_out[:] = p_ref[:]

    def body(_, carry):
        p_int = (
            rhs - ae * p_out[2:, 1:-1] - aw * p_out[:-2, 1:-1]
            - an * p_out[1:-1, 2:] - a_s * p_out[1:-1, :-2]
        ) * ap_inv
        p_out[1:-1, 1:-1] = p_int
        return carry

    lax.fori_loop(0, nm.n_jacobi, body, 0, unroll=True)
    p = p_out[:]
    r_u = (rho + sk._sh(rho, -1, 0)) * 0.5
    u_corr = us - dt / r_u * (p - sk._sh(p, -1, 0)) * g.dxi
    u = jnp.where(sk._region(shape, 2, g.nx + 1, 1, g.ny + 1), u_corr, u)
    r_v = (rho + sk._sh(rho, 0, -1)) * 0.5
    v_corr = vs - dt / r_v * (p - sk._sh(p, 0, -1)) * g.dyi
    v = jnp.where(sk._region(shape, 1, g.nx + 1, 2, g.ny + 1), v_corr, v)
    if even_step:
        F = sk._sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v)
        F = sk._sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u)
    else:
        F = sk._sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u)
        F = sk._sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v)
    F = clamp01(F)
    u, v, F, p = sk._bc_values(g, u, v, F, p)
    F_out[:] = F
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p


def make_step(predict_body):
    def stepfn(state, even_step):
        F = state.F
        shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
        out = pl.pallas_call(
            partial(_fullstep_kernel_v, cfg=cfg, even_step=even_step,
                    predict_body=predict_body),
            out_shape=(shape,) * 4,
            in_specs=sk._vmem_specs(4),
            out_specs=tuple(sk._vmem_specs(4)),
            compiler_params=sk._compiler_params(F, 40),
        )(state.F, state.u, state.v, state.p)
        return tv.State(F=out[0], u=out[1], v=out[2], p=out[3])

    @jax.jit
    def run(state):
        def pair(s, _):
            s = stepfn(s, False)
            s = stepfn(s, True)
            return s, None

        s, _ = lax.scan(pair, state, None, length=STEPS // 2)
        return s

    return run


s0 = tv.init_state(cfg, ic=1)
u, v, F, p = apply_bc(s0.u, s0.v, s0.F, s0.p)
s0 = tv.State(F=F, u=u, v=v, p=p)

run_prod = make_step(sk._predict_body)
run_var = make_step(_predict_body_collapsed)

# closeness check (500 steps)
a = run_prod(s0)
b = run_var(s0)
dF = float(jnp.abs(a.F - b.F).max())
du = float(jnp.abs(a.u - b.u).max())
print(f"drift after {STEPS} steps: dF={dF:.3e} du={du:.3e}", flush=True)
assert dF < 1e-3 and du < 1e-3


def t(name, fn):
    out = fn(s0)
    np.asarray(out.F[:1, :8])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(s0)
        np.asarray(out.F[:1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    us_step = best / STEPS * 1e6
    print(f"{name:12s}: {us_step:7.2f} us/step", flush=True)
    return us_step


pa = t("production", run_prod)
vb = t("collapsed", run_var)
pa2 = t("prod re-run", run_prod)
print(f"collapsed delta: {vb - pa:+.2f} us ({100 * (vb - pa) / pa:+.1f}%), "
      f"drift {pa2 - pa:+.2f}", flush=True)
