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
    """7-point coefficients with Neumann-edge zeroing (3dvof.py:269-275).

    Built ON-DEVICE from iota masks selecting the f64-precomputed
    edge-class values — bitwise-identical to the former numpy constant
    volumes (same ((((ae+aw)+an)+a_s)+ab)+af accumulation before the
    dtype cast, the order pallas_kernels/jacobi3d.py replicates), but the
    jitted program no longer inlines 7 whole-volume literals: at 256^3
    they were 7 x 67 MB and overran the remote compile service's request
    size limit (HTTP 413)."""
    dxi2 = np.float64(g.dxi) ** 2
    dyi2 = np.float64(g.dyi) ** 2
    dzi2 = np.float64(g.dzi) ** 2
    shape = (g.nx, g.ny, g.nz)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    cx = jnp.asarray(dxi2.astype(dtype))
    cy = jnp.asarray(dyi2.astype(dtype))
    cz = jnp.asarray(dzi2.astype(dtype))
    zero = jnp.zeros((), dtype)
    ae = jnp.where(i == g.nx - 1, zero, cx)
    aw = jnp.where(i == 0, zero, cx)
    an = jnp.where(j == g.ny - 1, zero, cy)
    a_s = jnp.where(j == 0, zero, cy)
    af = jnp.where(k == g.nz - 1, zero, cz)
    ab = jnp.where(k == 0, zero, cz)

    def const(ex, ey, ez):
        t = dxi2 if ex else dxi2 + dxi2
        for _ in range(2 - ey):
            t = t + dyi2
        for _ in range(2 - ez):
            t = t + dzi2
        return jnp.asarray((-1.0 / t).astype(dtype))

    ex = (i == 0) | (i == g.nx - 1)
    ey = (j == 0) | (j == g.ny - 1)
    ez = (k == 0) | (k == g.nz - 1)
    ap_inv = jnp.where(
        ex,
        jnp.where(ey, jnp.where(ez, const(1, 1, 1), const(1, 1, 0)),
                  jnp.where(ez, const(1, 0, 1), const(1, 0, 0))),
        jnp.where(ey, jnp.where(ez, const(0, 1, 1), const(0, 1, 0)),
                  jnp.where(ez, const(0, 0, 1), const(0, 0, 0))),
    )
    return ae, aw, an, a_s, af, ab, ap_inv


def _rhs_3d(g: Grid3D, dt, u_star, v_star, w_star, rho):
    I = (slice(1, -1),) * 3
    return rho[I] / dt * (
        (u_star[2:, 1:-1, 1:-1] - u_star[I]) * g.dxi
        + (v_star[1:-1, 2:, 1:-1] - v_star[I]) * g.dyi
        + (w_star[1:-1, 1:-1, 2:] - w_star[I]) * g.dzi
    )


def _neigh_3d(g: Grid3D, coeffs, p, rhs):
    ae, aw, an, a_s, af, ab, _ = coeffs
    return (
        rhs
        - ae * p[2:, 1:-1, 1:-1]
        - aw * p[:-2, 1:-1, 1:-1]
        - an * p[1:-1, 2:, 1:-1]
        - a_s * p[1:-1, :-2, 1:-1]
        - af * p[1:-1, 1:-1, 2:]
        - ab * p[1:-1, 1:-1, :-2]
    )


def _solve_pressure_3d(g: Grid3D, dt, n_iter, p, u_star, v_star, w_star, rho):
    rhs = _rhs_3d(g, dt, u_star, v_star, w_star, rho)
    coeffs = _poisson_coeffs_3d(g, p.dtype)
    ap_inv = coeffs[-1]
    I = (slice(1, -1),) * 3

    def body(_, p):
        return p.at[I].set(_neigh_3d(g, coeffs, p, rhs) * ap_inv)

    return jax.lax.fori_loop(0, n_iter, body, p, unroll=True)


def _rbsor_3d(g: Grid3D, p, rhs, omega: float, tol: float, max_iter: int,
              tol_rel: float = 0.0):
    """3-D red-black SOR with the on-device residual stop — the same
    upgrade path over the reference's fixed Jacobi sweeps that
    ops/poisson._rbsor gives the 2-D solver (the reference's 3-D loop
    also runs fixed 10 sweeps, 3dvof.py:598-623): coloring on
    (i+j+k) % 2, the rhs nullspace projected out (pure-Neumann system;
    pressure is defined up to a constant), `lax.while_loop` exits when
    max|Ap - rhs| <= tol — or at the dtype's residual floor
    (ops.poisson.STALL_ITERS with no new best AND plateaued; the f32 TPU
    case). Not differentiable (while_loop); the diff path keeps the
    fixed-iteration solvers."""
    from .ops.poisson import PLATEAU_FACTOR, STALL_ITERS, effective_tol
    rhs = rhs - jnp.mean(rhs)
    tol = effective_tol(tol, tol_rel, rhs)
    coeffs = _poisson_coeffs_3d(g, p.dtype)
    ap_inv = coeffs[-1]
    ap = 1.0 / ap_inv
    I = (slice(1, -1),) * 3
    # on-device checkerboard (a baked numpy bool is an O(n^3) program
    # literal; cf. _poisson_coeffs_3d)
    shp = (g.nx, g.ny, g.nz)
    red = ((jax.lax.broadcasted_iota(jnp.int32, shp, 0)
            + jax.lax.broadcasted_iota(jnp.int32, shp, 1)
            + jax.lax.broadcasted_iota(jnp.int32, shp, 2)) % 2 == 0)

    def half_sweep(p, mask):
        gs = _neigh_3d(g, coeffs, p, rhs) * ap_inv
        p_int = p[I]
        upd = p_int + omega * (gs - p_int)
        return p.at[I].set(jnp.where(mask, upd, p_int))

    def resid(p):
        r = _neigh_3d(g, coeffs, p, rhs) - ap * p[I]
        r = r - jnp.mean(r)
        return jnp.max(jnp.abs(r))

    def cond(carry):
        p, it, r, best, stall = carry
        floored = (stall >= STALL_ITERS) & (r <= PLATEAU_FACTOR * best)
        return (it < max_iter) & (r > tol) & ~floored

    def body(carry):
        p, it, r, best, stall = carry
        p = half_sweep(p, red)
        p = half_sweep(p, ~red)
        r = resid(p)
        improved = r < best
        best = jnp.minimum(best, r)
        stall = jnp.where(improved, 0, stall + 1)
        return p, it + 1, r, best, stall

    i0 = jnp.zeros((), jnp.int32)
    r0 = resid(p)
    p, *_ = jax.lax.while_loop(cond, body, (p, i0, r0, r0, i0))
    return p


def _resolve_auto_3d(g: Grid3D) -> str:
    """pressure_solver='auto', 3-D: 'mg' wherever the grid coarsens,
    'rbsor' otherwise — the same policy as solver.resolve_auto and the
    distributed drivers (mg_solve raises on non-coarsenable grids)."""
    from .ops.mg import mg_levels

    return "mg" if len(mg_levels((g.nx, g.ny, g.nz))) >= 2 else "rbsor"


_SWEEP_ORDER = {0: (0, 1, 2), 1: (1, 2, 0), 2: (2, 0, 1)}


def _pad_jk(g: Grid3D):
    """Mosaic DMA slices must be lane/sublane aligned: the slab kernels run
    on fields whose j-dim is padded to a multiple of 8 and k-dim to a
    multiple of 128 (the pad region is masked to zero everywhere)."""
    p1 = (-(g.ny + 2)) % 8
    p2 = (-(g.nz + 2)) % 128
    return p1, p2


def _apply_bc_3d_win(g: Grid3D, u, v, w, F, p):
    """apply_bc_3d with explicit grid-bound indices instead of -1/-2, so it
    acts on the true ghost planes of jk-padded arrays (ops/bc.py order:
    y-faces, then x-faces, then z-faces)."""
    jm, jw = g.ny + 1, g.ny  # ghost / wall-adjacent j index
    km, kw = g.nz + 1, g.nz
    im, iw = g.nx + 1, g.nx

    u = u.at[:, 0, :].set(u[:, 1, :])
    u = u.at[:, jm, :].set(u[:, jw, :])
    v = v.at[:, 1, :].set(0.0)
    v = v.at[:, jm, :].set(0.0)
    w = w.at[:, 0, :].set(w[:, 1, :])
    w = w.at[:, jm, :].set(w[:, jw, :])
    F = F.at[:, 0, :].set(F[:, 1, :])
    F = F.at[:, jm, :].set(F[:, jw, :])
    p = p.at[:, 0, :].set(p[:, 1, :])
    p = p.at[:, jm, :].set(p[:, jw, :])

    u = u.at[1, :, :].set(0.0)
    u = u.at[im, :, :].set(0.0)
    v = v.at[0, :, :].set(v[1, :, :])
    v = v.at[im, :, :].set(v[iw, :, :])
    w = w.at[0, :, :].set(w[1, :, :])
    w = w.at[im, :, :].set(w[iw, :, :])
    F = F.at[0, :, :].set(F[1, :, :])
    F = F.at[im, :, :].set(F[iw, :, :])
    p = p.at[0, :, :].set(p[1, :, :])
    p = p.at[im, :, :].set(p[iw, :, :])

    u = u.at[:, :, 0].set(u[:, :, 1])
    u = u.at[:, :, km].set(u[:, :, kw])
    v = v.at[:, :, 0].set(v[:, :, 1])
    v = v.at[:, :, km].set(v[:, :, kw])
    w = w.at[:, :, 1].set(0.0)
    w = w.at[:, :, km].set(0.0)
    F = F.at[:, :, 0].set(F[:, :, 1])
    F = F.at[:, :, km].set(F[:, :, kw])
    p = p.at[:, :, 0].set(p[:, :, 1])
    p = p.at[:, :, km].set(p[:, :, kw])
    return u, v, w, F, p


def _step_3d_pallas(g: Grid3D, fl: Fluid, dt: float, n_jacobi: int,
                    state: State3D, phase: int,
                    pressure_solver: str = "jacobi",
                    sor_omega: float = 1.7, sor_tol: float = 1e-3,
                    sor_max_iter: int = 200, csf: bool = False,
                    sor_tol_rel: float = 0.0) -> State3D:
    """Single padded-at-the-edges step (pads/unpads around the padded-state
    step; `simulate_3d` pads once outside its scan instead)."""
    p1, p2 = _pad_jk(g)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, p1), (0, p2)))  # noqa: E731
    state = State3D(*(pad(a) for a in state))
    u, v, w, F, p = _apply_bc_3d_win(
        g, state.u, state.v, state.w, state.F, state.p)
    state = State3D(F=F, u=u, v=v, w=w, p=p)
    state = _step_3d_pallas_padded(g, fl, dt, n_jacobi, state, phase,
                                   pressure_solver, sor_omega, sor_tol,
                                   sor_max_iter, csf, sor_tol_rel)
    u, v, w, F, p = _apply_bc_3d_win(
        g, state.u, state.v, state.w, state.F, state.p)
    state = State3D(F=F, u=u, v=v, w=w, p=p)
    n1p, n2p = g.ny + 2, g.nz + 2
    return State3D(*(a[:, :n1p, :n2p] for a in state))


def _step_3d_pallas_padded(g: Grid3D, fl: Fluid, dt: float, n_jacobi: int,
                           state: State3D, phase: int,
                           pressure_solver: str = "jacobi",
                           sor_omega: float = 1.7, sor_tol: float = 1e-3,
                           sor_max_iter: int = 200,
                           csf: bool = False,
                           sor_tol_rel: float = 0.0) -> State3D:
    """The whole step on the slab-tiled Pallas kernels (VERDICT r1 #1):
    predict+rhs, chunk-streamed Jacobi, correction, and the three FCT
    sweeps each run as one double-buffered VMEM-streaming kernel; one
    O(n^2) ghost-BC XLA pass per step.

    Provable shortcuts vs the literal XLA pipeline (pinned exact by
    tests/test_3d.py):
    - post_process_f's whole-volume clamp is skipped: the sweeps already
      clamp every interior value, and the ghost ring (mirrors of clamped
      interiors) is re-mirrored by the final BC before anyone reads it.
    - the correction kernel zeroes the positions outside its update ranges
      instead of carrying u_prev through; every such position is either
      rewritten by the following BC or provably zero under the XLA path
      (u's i=0 ghost plane etc. — never written, init zero).
    - ALL of the XLA path's per-step BC applications are dropped (the
      whole-volume surface pass cost 1.8 ms/step at 200^3, 30% of the
      step). The ghost values the kernels actually consume are produced
      where they are needed instead:
      * predict reconstructs the velocity wall/ghost values on its loaded
        blocks (_bc_fix_uvw — bit-exact replica of set_BC's y/x/z face
        order); F enters predict only through center-sampled rho/nu.
      * the Jacobi kernel zeroes its own ghost ring; the correction masks
        out every row that could see a p/F/rho ghost.
      * the sweeps need F's ghost mirrors AS OF THE END OF THE PREVIOUS
        STEP (the reference applies set_BC before the sweeps and never
        updates ghosts inside them — stale-mirror semantics). The step's
        LAST sweep therefore writes fresh mirrors of its own output
        (mirror_out=True) and the earlier sweeps pass ghosts through, so
        the next step's sweeps read exactly the values the XLA path's BC
        would have materialized. Velocity wall zeros the sweeps read come
        from the correction's masks.
      Callers must apply one full BC to the *initial* state (stands in
      for the first step's pre-sweep BC) and one after the last step
      (u/v/w/p ghost parity of the returned state); simulate_3d and
      _step_3d_pallas do both."""
    import jax as _jax

    from .pallas_kernels.step3d import (
        pallas_correct3d,
        pallas_fct3d_sweep,
        pallas_predict3d_rhs,
    )
    from .pallas_kernels.jacobi3d import pallas_jacobi_3d

    interpret = _jax.default_backend() == "cpu"
    F, u, v, w, p = state

    us, vs, ws, rhs = pallas_predict3d_rhs(
        g, fl, dt, u, v, w, F, interpret=interpret, csf=csf
    )
    if pressure_solver == "jacobi":
        from .pallas_kernels import jacobi3d as _j3d

        if _j3d.jacobi3d_fits_vmem(g):
            p = pallas_jacobi_3d(g, n_jacobi, p, rhs, interpret=interpret)
        else:
            # beyond the resident-Jacobi VMEM envelope (~264^3 since the
            # round-5 single-volume kernel; 256^3 runs resident now) the
            # volume streams through VMEM out-of-place instead of the
            # round-3 whole-step XLA fallback (VERDICT r3 #4; measured
            # A/B: scripts/tpu_streamed256.py). Module-attr call so the
            # routing tests can monkeypatch it.
            p = _j3d.streamed_jacobi_3d(g, n_jacobi, p, rhs,
                                        interpret=interpret)
    else:
        # HYBRID projection (VERDICT r3 #3): the residual-driven solvers
        # are while_loops that cannot live in the chunked VMEM kernel, so
        # the solve runs as XLA between the Pallas predict and correct
        # phases, on the jk-pad-stripped layout. Only p's interior is
        # consumed downstream (the correction masks every row that could
        # see a ghost), and p's pad region must STAY zero (p persists
        # across steps), hence the zeros_like re-embed.
        ny2, nz2 = g.ny + 2, g.nz + 2
        p_un = p[:, :ny2, :nz2]
        rhs_int = rhs[1:g.nx + 1, 1:ny2 - 1, 1:nz2 - 1]
        if pressure_solver == "rbsor":
            p_sol = _rbsor_3d(g, p_un, rhs_int, sor_omega, sor_tol,
                              sor_max_iter, tol_rel=sor_tol_rel)
        elif pressure_solver == "mg":
            from .ops.mg import mg_solve

            p_sol = mg_solve(p_un, rhs_int,
                             (g.dxi**2, g.dyi**2, g.dzi**2),
                             sor_tol, sor_max_iter, tol_rel=sor_tol_rel)
        else:
            raise ValueError(
                f"unknown pressure_solver {pressure_solver!r} "
                "(expected 'jacobi', 'rbsor', or 'mg')")
        p = jnp.zeros_like(p).at[:, :ny2, :nz2].set(p_sol)
    u, v, w = pallas_correct3d(g, fl, dt, us, vs, ws, p, F,
                               interpret=interpret)
    vels = (u, v, w)
    order = _SWEEP_ORDER[phase]
    for idx, ax in enumerate(order):
        F = pallas_fct3d_sweep(g, dt, F, vels[ax], ax, interpret=interpret,
                               mirror_out=(idx == 2))
    return State3D(F=F, u=u, v=v, w=w, p=p)


def pallas3d_supported(g: Grid3D, csf: bool = False) -> bool:
    """Slab-kernel admission is the only gate: grids whose resident
    Jacobi volume no longer fits VMEM (~264^3 since the round-5
    single-volume kernel) route the solve through `streamed_jacobi_3d`
    instead of falling back to XLA (VERDICT r3 #4).
    streamed_jacobi_3d needs even nx, which step3d_slab_supported's
    chunk admission already implies."""
    from .pallas_kernels.step3d import step3d_slab_supported

    return step3d_slab_supported(g, csf)


def step_3d(g: Grid3D, fl: Fluid, dt: float, n_jacobi: int,
            state: State3D, phase: int, backend: str = "xla",
            pressure_solver: str = "jacobi", sor_omega: float = 1.7,
            sor_tol: float = 1e-3, sor_max_iter: int = 200,
            csf: bool = False, sor_tol_rel: float = 0.0) -> State3D:
    """One step; ``phase`` = istep % 3 selects the sweep rotation
    (3dvof.py:351-363; the main loop pre-increments istep, so the first
    step runs phase 1). backend='pallas' runs the slab-tiled kernel
    pipeline (any grid with even nx whose per-chunk working set fits
    VMEM — plane sizes to ~1024^2); grids beyond the RESIDENT-Jacobi
    envelope (~264^3) host the HBM-streamed Jacobi between the slab
    kernels instead of falling back (VERDICT r3 #4); grids the slab
    kernels cannot admit fall back to the XLA path with a warning.
    pressure_solver='rbsor'/'mg' swaps the reference-parity
    fixed Jacobi sweeps for a residual-driven upgrade (_rbsor_3d /
    ops.mg.mg_solve); with backend='pallas' the step runs HYBRID —
    Pallas predict/correct/sweeps with the XLA solve hosted between
    them (VERDICT r3 #3). ``csf=True`` enables 3-D surface tension
    (Youngs normals + Brackbill curvature, ops/normals3d.py; fused into
    the slab predict kernel when backend='pallas') — an UPGRADE over the
    reference, whose 3-D normals kernel is commented out so kappa stays
    zero (3dvof.py:304-332,607); the default False keeps reference
    parity bit-for-bit."""
    if pressure_solver == "auto":
        pressure_solver = _resolve_auto_3d(g)
    if backend == "pallas":
        if pallas3d_supported(g, csf):
            return _step_3d_pallas(g, fl, dt, n_jacobi, state, phase,
                                   pressure_solver, sor_omega, sor_tol,
                                   sor_max_iter, csf, sor_tol_rel)
        import warnings

        warnings.warn(
            f"backend='pallas' requested at {g.nx}x{g.ny}x{g.nz}, but the "
            "slab kernels need nx divisible by 2 with >=3 chunks and a "
            "per-chunk working set that fits VMEM; using the XLA path.")
    F, u, v, w, p = state
    rho, nu = mix_properties(fl, F)
    if csf:
        from .ops.normals3d import young_normals_curvature_3d

        _, _, _, kappa = young_normals_curvature_3d(g, F)
    else:
        # surface tension inert in 3-D, like the reference (3dvof.py:607)
        kappa = jnp.zeros_like(F)

    u_star, v_star, w_star = predict_velocity_3d(
        g, fl, dt, u, v, w, F, rho, nu, kappa
    )
    u, v, w, F, p, rho = apply_bc_3d(u, v, w, F, p, rho)
    if pressure_solver == "rbsor":
        rhs = _rhs_3d(g, dt, u_star, v_star, w_star, rho)
        p = _rbsor_3d(g, p, rhs, sor_omega, sor_tol, sor_max_iter,
                      tol_rel=sor_tol_rel)
    elif pressure_solver == "mg":
        from .ops.mg import mg_solve

        rhs = _rhs_3d(g, dt, u_star, v_star, w_star, rho)
        p = mg_solve(p, rhs, (g.dxi**2, g.dyi**2, g.dzi**2),
                     sor_tol, sor_max_iter, tol_rel=sor_tol_rel)
    elif pressure_solver != "jacobi":
        raise ValueError(
            f"unknown pressure_solver {pressure_solver!r} "
            "(expected 'jacobi', 'rbsor', or 'mg')")
    else:
        p = _solve_pressure_3d(g, dt, n_jacobi, p, u_star, v_star,
                               w_star, rho)
    u, v, w = update_velocity_3d(g, dt, u, v, w, u_star, v_star, w_star, p, rho)
    u, v, w, F, p, rho = apply_bc_3d(u, v, w, F, p, rho)
    F = rudman_advect_3d(g, dt, F, u, v, w, phase)
    F = clamp01(F)
    u, v, w, F, p, _ = apply_bc_3d(u, v, w, F, p, rho)
    return State3D(F=F, u=u, v=v, w=w, p=p)


def simulate_3d(g: Grid3D, state: State3D, n_steps: int,
                dt: float = 4e-6, n_jacobi: int = 10,
                fl: Fluid | None = None, backend: str = "xla",
                istep0: int = 0, pressure_solver: str = "jacobi",
                sor_omega: float = 1.7, sor_tol: float = 1e-3,
                sor_max_iter: int = 200, csf: bool = False,
                sor_tol_rel: float = 0.0) -> State3D:
    """Advance n_steps with the reference's 1-based phase schedule
    (first step phase 1, then 2, 0, 1, ...). The pallas backend pads the
    state once (jk lane/sublane alignment) and scans the padded step.

    ``istep0``: global index of the last step already taken — chunked
    callers (the CLI's frame loop) MUST pass it so the istep % 3 sweep
    rotation continues across calls exactly like the reference's
    continuous istep counter (3dvof.py:351-363); restarting the schedule
    each chunk follows a (valid but) different trajectory. Reduced mod 3
    before the jitted core, so chunked drivers compile at most three
    programs per shape."""
    g.validate()  # cubic cells only (the 3-D FCT scale factors assume it)
    if pressure_solver == "auto":
        pressure_solver = _resolve_auto_3d(g)
    return _simulate_3d_impl(g, state, n_steps, dt, n_jacobi, fl,
                             backend, istep0 % 3, pressure_solver,
                             sor_omega, sor_tol, sor_max_iter, csf,
                             sor_tol_rel)


@partial(jax.jit,
         static_argnums=(0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def _simulate_3d_impl(g: Grid3D, state: State3D, n_steps: int,
                      dt: float, n_jacobi: int,
                      fl: Fluid | None, backend: str,
                      istep0: int, pressure_solver: str = "jacobi",
                      sor_omega: float = 1.7, sor_tol: float = 1e-3,
                      sor_max_iter: int = 200, csf: bool = False,
                      sor_tol_rel: float = 0.0) -> State3D:
    fl = fl or Fluid()
    use_pallas = backend == "pallas" and pallas3d_supported(g, csf)
    if use_pallas:
        p1, p2 = _pad_jk(g)
        state = State3D(
            *(jnp.pad(a, ((0, 0), (0, p1), (0, p2))) for a in state)
        )
        # one entry BC stands in for the first step's pre-sweep BC; one
        # exit BC (below) restores u/v/w/p ghost parity of the returned
        # state (see _step_3d_pallas_padded's docstring)
        u, v, w, F, p = _apply_bc_3d_win(
            g, state.u, state.v, state.w, state.F, state.p)
        state = State3D(F=F, u=u, v=v, w=w, p=p)
        stepper = lambda s, ph: _step_3d_pallas_padded(  # noqa: E731
            g, fl, dt, n_jacobi, s, ph, pressure_solver, sor_omega,
            sor_tol, sor_max_iter, csf, sor_tol_rel)
    else:
        stepper = lambda s, ph: step_3d(  # noqa: E731
            g, fl, dt, n_jacobi, s, ph, backend, pressure_solver,
            sor_omega, sor_tol, sor_max_iter, csf, sor_tol_rel)

    ph1 = (istep0 + 1) % 3  # phase of the first step taken here

    def triple(s, _):
        s = stepper(s, ph1)
        s = stepper(s, (ph1 + 1) % 3)
        s = stepper(s, (ph1 + 2) % 3)
        return s, None

    n_triples, rem = divmod(n_steps, 3)
    state, _ = jax.lax.scan(triple, state, None, length=n_triples)
    for r in range(rem):
        state = stepper(state, (ph1 + r) % 3)
    if use_pallas:
        u, v, w, F, p = _apply_bc_3d_win(
            g, state.u, state.v, state.w, state.F, state.p)
        state = State3D(F=F, u=u, v=v, w=w, p=p)
        n1p, n2p = g.ny + 2, g.nz + 2
        state = State3D(*(a[:, :n1p, :n2p] for a in state))
    return state
