"""Close the 2-D mono ~52 us/step "BC + state I/O + launch" remainder.

BASELINE.md's attribution (scripts/tpu_2d_attrib.py) leaves ~52 us/step
at 512^2 unattributed: every phase-elision variant still pays BC + state
I/O + the Mosaic launch, so their deltas can only bound the compute
phases. The round-3 multi-step A/B (4 lean steps per launch, state
VMEM-resident across the chunk) already showed launches and the ~5 MB
state round trip are fully hidden — so what IS the remainder? Two more
elisions, timed in-scan in one process (CLAUDE.md timing rules):

  copy-only   — read 4 fields, write 4 fields, zero compute: the
                irreducible launch + HBM state-I/O floor.
  no-BC       — the full variant step with the in-kernel `_bc_values`
                ghost writes skipped (numerically wrong after step 1;
                program-shape-valid, which is all attribution needs).

full - noBC bounds the BC ghost writes; copy-only IS the floor. If
floor + phases + BC ~= full, the remainder is closed: nothing left to
reclaim without changing field residency, which the multi-step A/B
already measured as a wash (BASELINE.md negative results).
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
                    *, cfg, even_step, do_bc):
    """The full mono step (tpu_2d_attrib's variant at all-phases-on) with
    the trailing BC ghost writes optionally elided."""
    g, nm = cfg.grid, cfg.num
    F = F_ref[:]
    u = u_ref[:]
    v = v_ref[:]
    shape = F.shape
    dt = nm.dt

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

    lax.fori_loop(0, 10, body, 0, unroll=True)
    p = p_out[:]

    r_u = (rho + _sh(rho, -1, 0)) * 0.5
    u_corr = us - dt / r_u * (p - _sh(p, -1, 0)) * g.dxi
    u = jnp.where(_region(shape, 2, g.nx + 1, 1, g.ny + 1), u_corr, u)
    r_v = (rho + _sh(rho, 0, -1)) * 0.5
    v_corr = vs - dt / r_v * (p - _sh(p, 0, -1)) * g.dyi
    v = jnp.where(_region(shape, 1, g.nx + 1, 2, g.ny + 1), v_corr, v)

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

    if do_bc:
        u, v, F, p = _bc_values(g, u, v, F, p)
    F_out[:] = F
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p


def _copy_kernel(F_ref, u_ref, v_ref, p_ref,
                 F_out, u_out, v_out, p_out):
    F_out[:] = F_ref[:]
    u_out[:] = u_ref[:]
    v_out[:] = v_ref[:]
    p_out[:] = p_ref[:]


def variant_step(state, even_step, do_bc):
    F = state.F
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    out = pl.pallas_call(
        partial(_variant_kernel, cfg=cfg, even_step=even_step,
                do_bc=do_bc),
        out_shape=(shape,) * 4,
        in_specs=_vmem_specs(4),
        out_specs=tuple(_vmem_specs(4)),
        compiler_params=_compiler_params(F, 40),
    )(state.F, state.u, state.v, state.p)
    return tv.State(F=out[0], u=out[1], v=out[2], p=out[3])


def copy_step(state):
    F = state.F
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    out = pl.pallas_call(
        _copy_kernel,
        out_shape=(shape,) * 4,
        in_specs=_vmem_specs(4),
        out_specs=tuple(_vmem_specs(4)),
        compiler_params=_compiler_params(F, 40),
    )(state.F, state.u, state.v, state.p)
    return tv.State(F=out[0], u=out[1], v=out[2], p=out[3])


def make_run(do_bc=True, copy_only=False):
    @jax.jit
    def run(state):
        def pair(s, _):
            if copy_only:
                s = copy_step(s)
                s = copy_step(s)
            else:
                s = variant_step(s, False, do_bc)
                s = variant_step(s, True, do_bc)
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
full = t("variant full+BC", make_run(do_bc=True))
nobc = t("variant no-BC", make_run(do_bc=False))
floor = t("copy-only floor", make_run(copy_only=True))
full2 = t("variant full (re-run)", make_run(do_bc=True))

print(f"\nBC ghost writes:       {full - nobc:6.2f} us/step", flush=True)
print(f"launch + state I/O:    {floor:6.2f} us/step (copy-only floor)",
      flush=True)
print(f"compute (full-floor):  {full - floor:6.2f} us/step", flush=True)
print(f"env drift: full {full:.2f} vs re-run {full2:.2f}", flush=True)
