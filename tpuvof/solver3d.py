"""3-D time-step driver (reference 3dvof.py:598-627).

Experimental 3-D dam break: same pipeline as 2-D with w-momentum, a 7-point
Poisson stencil and three-way FCT sweep rotation; surface tension inert
(the reference's normals kernel is commented out, 3dvof.py:304-332, so
kappa stays zero and the sigma terms vanish identically — replicated here
by passing a zero kappa field).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import Fluid
from .grid import Grid3D
from .state import State3D, init_state_3d
from .ops import apply_bc_3d, clamp01, mix_properties
from .ops.fct3d import rudman_advect_3d
from .ops.momentum3d import predict_velocity_3d, update_velocity_3d

__all__ = ["step_3d", "simulate_3d", "init_state_3d"]


def _poisson_coeffs_3d(g: Grid3D, dtype):
    """7-point coefficients with Neumann-edge zeroing (3dvof.py:269-275)."""
    dxi2, dyi2, dzi2 = g.dxi**2, g.dyi**2, g.dzi**2
    shape = (g.nx, g.ny, g.nz)
    ae = np.full(shape, dxi2)
    aw = np.full(shape, dxi2)
    an = np.full(shape, dyi2)
    a_s = np.full(shape, dyi2)
    af = np.full(shape, dzi2)
    ab = np.full(shape, dzi2)
    ae[-1, :, :] = 0.0
    aw[0, :, :] = 0.0
    an[:, -1, :] = 0.0
    a_s[:, 0, :] = 0.0
    af[:, :, -1] = 0.0
    ab[:, :, 0] = 0.0
    ap_inv = -1.0 / (ae + aw + an + a_s + ab + af)
    return tuple(x.astype(dtype) for x in (ae, aw, an, a_s, af, ab, ap_inv))


def _solve_pressure_3d(g: Grid3D, dt, n_iter, p, u_star, v_star, w_star, rho):
    I = (slice(1, -1),) * 3
    rhs = rho[I] / dt * (
        (u_star[2:, 1:-1, 1:-1] - u_star[I]) * g.dxi
        + (v_star[1:-1, 2:, 1:-1] - v_star[I]) * g.dyi
        + (w_star[1:-1, 1:-1, 2:] - w_star[I]) * g.dzi
    )
    ae, aw, an, a_s, af, ab, ap_inv = _poisson_coeffs_3d(g, p.dtype)

    def body(_, p):
        p_int = (
            rhs
            - ae * p[2:, 1:-1, 1:-1]
            - aw * p[:-2, 1:-1, 1:-1]
            - an * p[1:-1, 2:, 1:-1]
            - a_s * p[1:-1, :-2, 1:-1]
            - af * p[1:-1, 1:-1, 2:]
            - ab * p[1:-1, 1:-1, :-2]
        ) * ap_inv
        return p.at[I].set(p_int)

    return jax.lax.fori_loop(0, n_iter, body, p, unroll=True)


def step_3d(g: Grid3D, fl: Fluid, dt: float, n_jacobi: int,
            state: State3D, phase: int, backend: str = "xla") -> State3D:
    """One step; ``phase`` = istep % 3 selects the sweep rotation
    (3dvof.py:351-363; the main loop pre-increments istep, so the first
    step runs phase 1). backend='pallas' runs the Jacobi iterations in the
    fused VMEM-resident kernel when the volume fits (<= ~144^3); the
    zeroed ghost ring it returns is re-mirrored by the BC right after the
    velocity correction, before any ghost consumer."""
    F, u, v, w, p = state
    rho, nu = mix_properties(fl, F)
    kappa = jnp.zeros_like(F)  # surface tension inert in 3-D (3dvof.py:607)

    u_star, v_star, w_star = predict_velocity_3d(
        g, fl, dt, u, v, w, F, rho, nu, kappa
    )
    u, v, w, F, p, rho = apply_bc_3d(u, v, w, F, p, rho)

    from .pallas_kernels.jacobi3d import jacobi3d_fits_vmem, pallas_jacobi_3d

    if backend == "pallas" and jacobi3d_fits_vmem(g):
        import jax as _jax

        I = (slice(1, -1),) * 3
        rhs = rho[I] / dt * (
            (u_star[2:, 1:-1, 1:-1] - u_star[I]) * g.dxi
            + (v_star[1:-1, 2:, 1:-1] - v_star[I]) * g.dyi
            + (w_star[1:-1, 1:-1, 2:] - w_star[I]) * g.dzi
        )
        p = pallas_jacobi_3d(
            g, n_jacobi, p, rhs,
            interpret=(_jax.default_backend() == "cpu"),
        )
    else:
        p = _solve_pressure_3d(g, dt, n_jacobi, p, u_star, v_star, w_star, rho)
    u, v, w = update_velocity_3d(g, dt, u, v, w, u_star, v_star, w_star, p, rho)
    u, v, w, F, p, rho = apply_bc_3d(u, v, w, F, p, rho)
    F = rudman_advect_3d(g, dt, F, u, v, w, phase)
    F = clamp01(F)
    u, v, w, F, p, _ = apply_bc_3d(u, v, w, F, p, rho)
    return State3D(F=F, u=u, v=v, w=w, p=p)


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def simulate_3d(g: Grid3D, state: State3D, n_steps: int,
                dt: float = 4e-6, n_jacobi: int = 10,
                fl: Fluid | None = None, backend: str = "xla") -> State3D:
    """Advance n_steps with the reference's 1-based phase schedule
    (first step phase 1, then 2, 0, 1, ...)."""
    fl = fl or Fluid()

    def triple(s, _):
        s = step_3d(g, fl, dt, n_jacobi, s, 1, backend)
        s = step_3d(g, fl, dt, n_jacobi, s, 2, backend)
        s = step_3d(g, fl, dt, n_jacobi, s, 0, backend)
        return s, None

    n_triples, rem = divmod(n_steps, 3)
    state, _ = jax.lax.scan(triple, state, None, length=n_triples)
    for r in range(rem):
        state = step_3d(g, fl, dt, n_jacobi, state, (r + 1) % 3, backend)
    return state
