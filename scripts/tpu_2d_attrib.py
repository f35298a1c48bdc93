"""In-process cost attribution + roofline for the 2-D mono kernel at 512^2.

BASELINE.md calls the 512^2 mono step "VPU-compute-bound" without numbers
(VERDICT r2 #7). This harness publishes them: per-phase attribution via
variant whole-step kernels (same structure as step_kernels._fullstep_kernel
with phases elided), a traced flop count (jaxpr arithmetic ops x element
counts), and the implied VPU utilization. All variants timed back-to-back
in ONE process (CLAUDE.md timing rules).
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
from jax.experimental.pallas import tpu as pltpu

import tpuvof as tv
from tpuvof.ops.common import clamp01
from tpuvof.pallas_kernels.step_kernels import (
    _bc_values,
    _compiler_params,
    _inline_poisson_coeffs,
    _predict_body,
    _sh,
    _sweep_body,
    _region,
    _vmem_specs,
)

print("backend:", jax.default_backend(), flush=True)

N = int(os.environ.get("N", "512"))
STEPS = 500
cfg = tv.SimConfig(grid=tv.Grid2D(N, N))


def _variant_kernel(F_ref, u_ref, v_ref, p_ref,
                    F_out, u_out, v_out, p_out,
                    *, cfg, even_step, n_jacobi, do_predict, do_sweeps):
    """step_kernels._fullstep_kernel with phases elided for attribution."""
    g, nm = cfg.grid, cfg.num
    F = F_ref[:]
    u = u_ref[:]
    v = v_ref[:]
    shape = F.shape
    dt = nm.dt

    if do_predict:
        us, vs, rho = _predict_body(cfg, u, v, F)
        rhs = (
            rho[1:-1, 1:-1] / dt
            * ((us[2:, 1:-1] - us[1:-1, 1:-1]) * g.dxi
               + (vs[1:-1, 2:] - vs[1:-1, 1:-1]) * g.dyi)
        )
        ae, aw, an, a_s, ap_inv = _inline_poisson_coeffs(g, p_ref.dtype)
        p_out[:] = p_ref[:]

        def body(_, carry):
            p_int = (
                rhs
                - ae * p_out[2:, 1:-1]
                - aw * p_out[:-2, 1:-1]
                - an * p_out[1:-1, 2:]
                - a_s * p_out[1:-1, :-2]
            ) * ap_inv
            p_out[1:-1, 1:-1] = p_int
            return carry

        lax.fori_loop(0, n_jacobi, body, 0, unroll=True)
        p = p_out[:]

        r_u = (rho + _sh(rho, -1, 0)) * 0.5
        u_corr = us - dt / r_u * (p - _sh(p, -1, 0)) * g.dxi
        u = jnp.where(_region(shape, 2, g.nx + 1, 1, g.ny + 1), u_corr, u)
        r_v = (rho + _sh(rho, 0, -1)) * 0.5
        v_corr = vs - dt / r_v * (p - _sh(p, 0, -1)) * g.dyi
        v = jnp.where(_region(shape, 1, g.nx + 1, 2, g.ny + 1), v_corr, v)
    else:
        p_out[:] = p_ref[:]
        p = p_out[:]

    if do_sweeps:
        def sweep_x(F):
            return _sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u,
                               n_axis=g.nx, n_other=g.ny)

        def sweep_y(F):
            return _sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v,
                               n_axis=g.ny, n_other=g.nx)

        if even_step:
            F = sweep_y(F)
            F = sweep_x(F)
        else:
            F = sweep_x(F)
            F = sweep_y(F)
        F = clamp01(F)

    u, v, F, p = _bc_values(g, u, v, F, p)
    F_out[:] = F
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p


def variant_step(state, even_step, n_jacobi=10, do_predict=True,
                 do_sweeps=True):
    F = state.F
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    out = pl.pallas_call(
        partial(_variant_kernel, cfg=cfg, even_step=even_step,
                n_jacobi=n_jacobi, do_predict=do_predict,
                do_sweeps=do_sweeps),
        out_shape=(shape,) * 4,
        in_specs=_vmem_specs(4),
        out_specs=tuple(_vmem_specs(4)),
        compiler_params=_compiler_params(F, 40),
    )(state.F, state.u, state.v, state.p)
    return tv.State(F=out[0], u=out[1], v=out[2], p=out[3])


def make_run(**kw):
    @jax.jit
    def run(state):
        def pair(s, _):
            s = variant_step(s, False, **kw)
            s = variant_step(s, True, **kw)
            return s, None

        s, _ = lax.scan(pair, state, None, length=STEPS // 2)
        return s

    return run


s0 = tv.init_state(cfg, ic=1)
from tpuvof.ops import apply_bc  # noqa: E402

u, v, F, p = apply_bc(s0.u, s0.v, s0.F, s0.p)
s0 = tv.State(F=F, u=u, v=v, p=p)


def t(name, fn):
    t0 = time.perf_counter()
    out = fn(s0)
    np.asarray(out.F[:1, :8])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(s0)
        np.asarray(out.F[:1, :8])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    us_step = best / STEPS * 1e6
    print(f"{name:24s}: {us_step:7.2f} us/step (compile {c:.1f}s)",
          flush=True)
    return us_step


# production baseline (the real mono path) for cross-checking the variant
from tpuvof.solver import _step_pallas_mono  # noqa: E402


@jax.jit
def prod_run(state):
    def pair(s, _):
        s = _step_pallas_mono(cfg, s, False)
        s = _step_pallas_mono(cfg, s, True)
        return s, None

    s, _ = lax.scan(pair, state, None, length=STEPS // 2)
    return s


prod = t("production mono", prod_run)
full = t("variant full", make_run())
jac1 = t("variant jacobi=1", make_run(n_jacobi=1))
nosweep = t("variant no-sweeps", make_run(do_sweeps=False))
nopred = t("variant no-predict", make_run(do_predict=False))
full2 = t("variant full (re-run)", make_run())

print(f"\n9 jacobi iters: {full - jac1:6.2f} us -> "
      f"{(full - jac1) / 9 * 10:6.2f} us for 10", flush=True)
print(f"2 FCT sweeps + clamp: {full - nosweep:6.2f} us", flush=True)
print(f"predict+project+correct: {full - nopred:6.2f} us", flush=True)
print(f"env drift: full {full:.2f} vs re-run {full2:.2f}", flush=True)

# ---- traced flop count of one lean step (jaxpr arithmetic ops x element
# counts; select/compare/min/max counted as 1 — they occupy VPU issue
# slots like adds) ----
ARITH = {
    "add", "sub", "mul", "div", "max", "min", "select_n", "abs", "neg",
    "sign", "integer_pow", "pow", "sqrt", "rsqrt", "lt", "le", "gt", "ge",
    "eq", "ne", "and", "or", "not", "rem",
}


def count_flops(jaxpr):
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("scan", "while", "cond", "pjit", "custom_vjp_call",
                    "custom_jvp_call", "closed_call", "remat"):
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    inner = count_flops(
                        sub.jaxpr if hasattr(sub.jaxpr, "eqns") else sub)
                    if prim == "scan":
                        inner *= eqn.params.get("length", 1)
                    total += inner
            continue
        if prim in ARITH:
            total += int(np.prod(eqn.outvars[0].aval.shape))
    return total


from tpuvof.solver import step  # noqa: E402

jaxpr = jax.make_jaxpr(lambda s: step(
    cfg.replace(num=tv.Numerics(backend="xla")), s, even_step=False,
    lean=True))(s0)
flops = count_flops(jaxpr.jaxpr)
cells = (N + 2) * (N + 2)
print(f"\ntraced arithmetic ops/step (XLA lean step as the op-count "
      f"proxy): {flops / 1e6:.1f} M -> {flops / cells:.0f} ops/cell",
      flush=True)
VPU_PEAK = 3.7e12  # v5e VPU fp32: 8x128 lanes x 4 ALUs x 0.94 GHz
for name, us in (("production", prod), ("variant", full)):
    util = flops / (us * 1e-6) / VPU_PEAK
    print(f"{name}: {flops / (us * 1e-6) / 1e12:.2f} Tops/s sustained "
          f"-> {util * 100:.0f}% of VPU peak "
          f"(bytes/cell-step = 32 streamed, {8 * cells * 4 / 1e6:.1f} MB "
          f"round trip -> {8 * cells * 4 / (us * 1e-6) / 1e9:.0f} GB/s "
          "equivalent; far under HBM peak, hence compute-bound)",
          flush=True)
