"""Fused phase kernels. See package docstring for the design.

Each `pl.pallas_call` takes whole (nx+2, ny+2) fields in VMEM with no grid
(one program instance): at the benchmark sizes (<= ~1024^2 f32) the working
set fits VMEM, every intermediate lives on-chip, and HBM traffic collapses
to the kernel's declared inputs/outputs. `interpret=` mode makes the same
kernels runnable on CPU for tests.

Mosaic (this jax version) supports neither scatter / dynamic_update_slice
nor shape-growing concatenate/pad on sliced operands, so the kernel bodies
are written in *full-shape roll+mask* form: every intermediate keeps the
padded field shape, neighbor access is `jnp.roll` (the wrap-around junk
only ever lands in ghost positions that the region masks zero out or that
no consumer reads), and region writes are `where` selects on iota masks.
The formulas mirror ops/fct.py and ops/momentum.py one-for-one; equivalence
against the XLA path is pinned by tests/test_pallas.py.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FCTVariant, SimConfig
from ..grid import Grid2D
from ..ops import mix_properties
from ..ops.common import clamp01
from ..ops.momentum import correct_velocity_interior

__all__ = [
    "pallas_available",
    "fits_vmem_2d",
    "project_pressure_and_correct",
    "pallas_fct_sweep_x",
    "pallas_fct_sweep_y",
    "pallas_predict",
    "pallas_fullstep_win",
    "pallas_fullstep_strips",
    "strips_layout_2d",
    "pad_to_strips",
    "step_halo_width",
]


def pallas_available() -> bool:
    return jax.default_backend() not in ("cpu",)


def fits_vmem_2d(n_i: int, n_j: int, fields: int = 24) -> bool:
    """Whether a whole-field kernel working set fits the v5e's VMEM:
    ~`fields` live field-sized temporaries at the (8, 128)-padded field
    shape under the 124 MB cap. THE single statement of the measured
    envelope — used by the serial backend dispatch (solver._fits_vmem)
    and the per-shard windowed-kernel check (parallel/dist.py), which
    previously carried independent copies of these constants.

    fields=24 is the MONO kernel's footprint (measured 113.4 MB at
    1024^2). The WINDOWED kernel (pallas_fullstep_win) runs ~27
    field-equivalents — the global-index masks and origin-shifted iotas
    are extra live temporaries; a 1070^2 window measured 132.70 MB at
    backend compile (> the 128 MB hard cap; the 24-field model predicted
    118.6). Windowed-shape callers must pass fields=WINDOWED_FIELDS."""
    n0 = ((n_i + 9) // 8) * 8
    n1 = ((n_j + 129) // 128) * 128
    return fields * n0 * n1 * 4 <= 124 * 2**20


# measured: 132.70 MB scoped VMEM for a 1070^2 window -> 26.9 field-
# equivalents at the (1072, 1152) padded shape; round up to 27
WINDOWED_FIELDS = 27


def pick_tile_2d(nx: int, ny: int, W: int,
                 fields: int = WINDOWED_FIELDS) -> tuple[int, int] | None:
    """Tile (Tx, Ty) (dividing the extents) whose W-halo-extended block
    fits the WINDOWED kernel's VMEM envelope — the tiled serial engine
    (solver._step_pallas_tiled) streams the windowed whole-step kernel
    over (nx/Tx) x (ny/Ty) such blocks. None if no candidate divides the
    grid (the caller falls back to the XLA path).

    FULL-WIDTH STRIPS (Ty = ny) are strongly preferred: their windows
    are contiguous row ranges, so the XLA-level `dynamic_slice` feeding
    each kernel call is a linear memcpy instead of a strided 2-D gather,
    the strip rounds to the (8,128) lane grid with ~6%% padding waste at
    2048 lanes (vs 15%% for a 558-wide square window), and a step takes
    nx/Tx launches instead of (nx/Tx)(ny/Ty). Square tiles remain the
    fallback for grids whose full width cannot fit VMEM even at Tx=32."""
    for Tx in (1024, 512, 256, 128, 64, 32):
        if nx % Tx == 0 and fits_vmem_2d(
                Tx + 2 * W, ny + 2 * W, fields=fields):
            return Tx, ny
    for T in (1024, 512, 256, 128, 64):
        if nx % T == 0 and ny % T == 0 and fits_vmem_2d(
                T + 2 * W, T + 2 * W, fields=fields):
            return T, T
    return None


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _compiler_params(F, n_live: int):
    """Raise Mosaic's conservative VMEM cap to fit the kernel's live set
    (n_live full-field temporaries, padded to the (8,128) tile grid)."""
    n0 = ((F.shape[0] + 7) // 8) * 8
    n1 = ((F.shape[1] + 127) // 128) * 128
    need = n_live * n0 * n1 * F.dtype.itemsize
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(max(need, 16 * 2**20), 124 * 2**20)
    )


def _iota(shape, axis):
    return lax.broadcasted_iota(jnp.int32, shape, axis)


def _sh(x, di=0, dj=0):
    """x[i+di, j+dj] with wrap-around; callers mask the wrapped junk."""
    if di:
        x = jnp.roll(x, -di, axis=0)
    if dj:
        x = jnp.roll(x, -dj, axis=1)
    return x


def _region(shape, r0, r1, c0, c1, oi=0, oj=0):
    """Mask of GLOBAL index box [r0,r1) x [c0,c1); (oi, oj) is the global
    index of the block's (0, 0) entry — 0 for the serial whole-grid kernels
    (identical masks), a traced shard offset for the windowed per-shard
    kernel (pallas_fullstep_win)."""
    row = _iota(shape, 0) + oi
    col = _iota(shape, 1) + oj
    return (row >= r0) & (row < r1) & (col >= c0) & (col < c1)


def _inline_poisson_coeffs(g: Grid2D, dtype, shape_int=None, oi=0, oj=0):
    """The Neumann-edge-zeroed 5-point coefficients, built in-kernel from
    iota masks (no HBM inputs). Bitwise identical to
    ops.poisson.poisson_coefficients: the edge-dependent ap_inv values are
    precomputed as float64 Python scalars and cast, matching the f64-then-
    cast array construction; TPU kernels cannot do f64 arithmetic, so the
    selection happens between ready-made constants.

    ``shape_int``/``oi``/``oj``: block-interior shape and the global index
    of the block origin for the windowed per-shard kernel (edge-zeroing
    happens at GLOBAL walls only)."""
    shape_int = shape_int or (g.nx, g.ny)
    col = _iota(shape_int, 0) + oi
    row = _iota(shape_int, 1) + oj
    east = col == g.nx - 1
    west = col == 0
    north = row == g.ny - 1
    south = row == 0

    dxi2 = np.float64(g.dxi) ** 2
    dyi2 = np.float64(g.dyi) ** 2
    zero = jnp.zeros((), dtype)
    ae = jnp.where(east, zero, jnp.asarray(dxi2, dtype))
    aw = jnp.where(west, zero, jnp.asarray(dxi2, dtype))
    an = jnp.where(north, zero, jnp.asarray(dyi2, dtype))
    a_s = jnp.where(south, zero, jnp.asarray(dyi2, dtype))

    def c(nx_edges, ny_edges):
        # replicate ((ae+aw)+an)+a_s accumulation order exactly (adding a
        # zeroed edge coefficient is exact, so only the nonzero adds count)
        t = dxi2 if nx_edges else dxi2 + dxi2
        for _ in range(2 - ny_edges):
            t = t + dyi2
        return jnp.asarray(-1.0 / t, dtype)

    x_edge = east | west
    y_edge = north | south
    ap_inv = jnp.where(
        x_edge,
        jnp.where(y_edge, c(1, 1), c(1, 0)),
        jnp.where(y_edge, c(0, 1), c(0, 0)),
    )
    return ae, aw, an, a_s, ap_inv


# ----------------------------------------------------------------------
# Fused projection: rho -> rhs -> N Jacobi iterations -> velocity correction
# (2dvof.py:236-280 as one kernel; the reference launches 12 kernels here)
# ----------------------------------------------------------------------
def _project_kernel(F_ref, us_ref, vs_ref, p_ref, u_ref, v_ref,
                    p_out, u_out, v_out, *, cfg: SimConfig):
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    F = F_ref[:]
    us = us_ref[:]
    vs = vs_ref[:]

    rho, _ = mix_properties(fl, F)
    rhs = (
        rho[1:-1, 1:-1]
        / nm.dt
        * (
            (us[2:, 1:-1] - us[1:-1, 1:-1]) * g.dxi
            + (vs[1:-1, 2:] - vs[1:-1, 1:-1]) * g.dyi
        )
    )
    ae, aw, an, a_s, ap_inv = _inline_poisson_coeffs(g, p_ref.dtype)

    # Jacobi iterations mutate the output ref in place: the VMEM-resident
    # Pallas idiom (no value-level partial updates in Mosaic).
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

    lax.fori_loop(0, nm.n_jacobi, body, 0, unroll=True)

    u_int, v_int = correct_velocity_interior(g, nm, us, vs, p_out[:], rho)
    u_out[:] = u_ref[:]
    v_out[:] = v_ref[:]
    u_out[2 : g.nx + 1, 1 : g.ny + 1] = u_int[1:, :]
    v_out[1 : g.nx + 1, 2 : g.ny + 1] = v_int[:, 1:]


def project_pressure_and_correct(cfg: SimConfig, F, u_star, v_star, p, u, v,
                                 interpret: bool = False):
    """Returns (p', u', v'): the full pressure projection phase."""
    shape = jax.ShapeDtypeStruct(p.shape, p.dtype)
    return pl.pallas_call(
        partial(_project_kernel, cfg=cfg),
        out_shape=(shape, shape, shape),
        in_specs=_vmem_specs(6),
        out_specs=tuple(_vmem_specs(3)),
        compiler_params=_compiler_params(F, 24),
        interpret=interpret,
    )(F, u_star, v_star, p, u, v)


# ----------------------------------------------------------------------
# Fused FCT sweeps: the whole 4-pass sweep as one kernel (2dvof.py:321-448)
# in full-shape roll+mask form (mirrors ops/fct._sweep_axis0 exactly).
# ----------------------------------------------------------------------
def _sweep_body(dx, dy, dt, var: FCTVariant, axis: int, F, u,
                n_axis=None, n_other=None, off_axis=0, off_other=0):
    """One FCT sweep as a pure value function (full-shape roll+mask form).

    ``n_axis``/``n_other``: GLOBAL interior extents (default: derived from
    the block shape, i.e. the serial whole-grid case); ``off_*``: global
    index of the block origin (windowed per-shard kernel)."""
    shape = F.shape
    n_ax = shape[axis] - 2 if n_axis is None else n_axis
    n_ot = shape[1 - axis] - 2 if n_other is None else n_other

    def sh(x, d):
        return _sh(x, d, 0) if axis == 0 else _sh(x, 0, d)

    idx = _iota(shape, axis) + off_axis
    odx = _iota(shape, 1 - axis) + off_other
    o_int = (odx >= 1) & (odx <= n_ot)
    interior = (idx >= 1) & (idx <= n_ax) & o_int
    face = (idx >= 1) & o_int  # faces 1 .. n+1

    # face fluxes (upwind low-order, downwind high-order donors)
    F_up = sh(F, -1)  # donor below the face
    fL = u * dt * jnp.where(u >= 0, F_up, F)
    fH = u * dt * jnp.where(u <= 0, F_up, F)
    a = jnp.where(face, fH - fL, 0.0)

    # pass 1: transported & diffused value with divergence compensation
    dv = dx * dy - dt * dy * (sh(u, 1) - u)
    netflux = (fL - sh(fL, 1)) * dy / (dx * dy)
    if var.full_dv:
        ftd = (F + netflux) * dx * dy / dv
    else:
        ftd = F + netflux * dx * dy / dv
    if var.clamp:
        ftd = clamp01(ftd)
    Ftd = jnp.where(interior, ftd, 0.0)

    # pass 2: Zalesak limiter ratios against local extrema of Ftd
    fmax = jnp.maximum(Ftd, jnp.maximum(sh(Ftd, -1), sh(Ftd, 1)))
    fmin = jnp.minimum(Ftd, jnp.minimum(sh(Ftd, -1), sh(Ftd, 1)))
    a_hi = sh(a, 1)
    pp = jnp.maximum(0.0, a) - jnp.minimum(0.0, a_hi)
    qp = (fmax - Ftd) * dx
    den_p = jnp.where(pp > var.guard_eps, pp + var.denom_eps, 1.0)
    rp = jnp.where(
        interior & (pp > var.guard_eps), jnp.minimum(1.0, qp / den_p), 0.0
    )
    pm = jnp.maximum(0.0, a_hi) - jnp.minimum(0.0, a)
    qm = (Ftd - fmin) * dx
    den_m = jnp.where(pm > var.guard_eps, pm + var.denom_eps, 1.0)
    rm = jnp.where(
        interior & (pm > var.guard_eps), jnp.minimum(1.0, qm / den_m), 0.0
    )

    # pass 3: corrected flux factor per face
    c = jnp.where(
        face,
        jnp.where(
            a >= 0,
            jnp.minimum(rp, sh(rm, -1)),
            jnp.minimum(sh(rp, -1), rm),
        ),
        0.0,
    )

    # pass 4: apply limited anti-diffusion
    corr = (sh(a, 1) * sh(c, 1) - a * c) / dy
    f_new = Ftd - corr * dx * dy / dv
    if var.clamp:
        f_new = clamp01(f_new)
    return jnp.where(interior, f_new, F)


def _sweep_kernel(F_ref, vel_ref, out_ref, *, dx, dy, dt,
                  var: FCTVariant, axis: int):
    out_ref[:] = _sweep_body(dx, dy, dt, var, axis, F_ref[:], vel_ref[:])


def _pallas_sweep(dx, dy, dt, var, F, vel, axis, interpret):
    return pl.pallas_call(
        partial(_sweep_kernel, dx=dx, dy=dy, dt=dt, var=var, axis=axis),
        out_shape=jax.ShapeDtypeStruct(F.shape, F.dtype),
        in_specs=_vmem_specs(2),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_compiler_params(F, 24),
        interpret=interpret,
    )(F, vel)


def pallas_fct_sweep_x(cfg: SimConfig, F, u, interpret: bool = False):
    g, nm = cfg.grid, cfg.num
    return _pallas_sweep(g.dx, g.dy, nm.dt, nm.fct, F, u, 0, interpret)


def pallas_fct_sweep_y(cfg: SimConfig, F, v, interpret: bool = False):
    g, nm = cfg.grid, cfg.num
    # square cells: the y-sweep is the axis-1 instance of the same kernel,
    # including the reference's dx-scaled limiter numerators (2dvof.py:417)
    return _pallas_sweep(g.dy, g.dx, nm.dt, nm.fct, F, v, 1, interpret)


# ----------------------------------------------------------------------
# Fused predictor: materials + Youngs normals + curvature + momentum
# (2dvof.py:198-233 + 283-309 as one kernel), roll+mask form.
# ----------------------------------------------------------------------
def _predict_body(cfg: SimConfig, u, v, F, oi=0, oj=0):
    """Materials + Youngs normals + curvature + momentum predictor as a
    pure value function; returns masked (u_star, v_star) full-shape values
    plus rho (reused by the projection). (oi, oj): global index of the
    block origin (0 for the serial whole-grid kernels)."""
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    shape = F.shape
    dt = nm.dt
    dxi, dyi = g.dxi, g.dyi
    rho, nu = mix_properties(fl, F)

    interior = _region(shape, 1, g.nx + 1, 1, g.ny + 1, oi, oj)

    # ---- Youngs corner gradients (full shape; junk masked) ----
    inv2dx = 1.0 / (2.0 * g.dx)
    inv2dy = 1.0 / (2.0 * g.dy)

    def f(di, dj):
        return _sh(F, di, dj)

    mx1 = -inv2dx * (f(1, 1) + f(1, 0) - f(0, 1) - f(0, 0))
    my1 = -inv2dy * (f(1, 1) - f(1, 0) + f(0, 1) - f(0, 0))
    mx2 = -inv2dx * (f(1, 0) + f(1, -1) - f(0, 0) - f(0, -1))
    my2 = -inv2dy * (f(1, 0) - f(1, -1) + f(0, 0) - f(0, -1))
    mx3 = -inv2dx * (f(0, 0) + f(0, -1) - f(-1, 0) - f(-1, -1))
    my3 = -inv2dy * (f(0, 0) - f(0, -1) + f(-1, 0) - f(-1, -1))
    mx4 = -inv2dx * (f(0, 1) + f(0, 0) - f(-1, 1) - f(-1, 0))
    my4 = -inv2dy * (f(0, 1) - f(0, 0) + f(-1, 1) - f(-1, 0))
    mxsum = (mx1 + mx2 + mx3 + mx4) * 0.25
    mysum = (my1 + my2 + my3 + my4) * 0.25

    degenerate = (jnp.abs(mxsum) < 1e-10) & (jnp.abs(mysum) < 1e-10)
    mag_sq = mxsum * mxsum + mysum * mysum
    safe_mag = jnp.sqrt(jnp.where(degenerate, 1.0, mag_sq))
    mx = jnp.where(interior, jnp.where(degenerate, mxsum, mxsum / safe_mag), 0.0)
    my = jnp.where(interior, jnp.where(degenerate, mysum, mysum / safe_mag), 0.0)

    kappa = jnp.where(
        interior,
        -(
            inv2dx * (_sh(mx, 1, 0) - _sh(mx, -1, 0))
            + inv2dy * (_sh(my, 0, 1) - _sh(my, 0, -1))
        ),
        0.0,
    )

    # ---- momentum predictor (mirrors ops/momentum.py formulas) ----
    v_here = 0.25 * (_sh(v, -1, 0) + _sh(v, -1, 1) + v + _sh(v, 0, 1))
    dudx = jnp.where(u > 0, (u - _sh(u, -1, 0)) * dxi, (_sh(u, 1, 0) - u) * dxi)
    dudy = jnp.where(v_here > 0, (u - _sh(u, 0, -1)) * dyi, (_sh(u, 0, 1) - u) * dyi)
    kap_u = (kappa + _sh(kappa, -1, 0)) * 0.5
    fx_kappa = -fl.sigma * (F - _sh(F, -1, 0)) * kap_u / g.dx
    us = u + dt * (
        nu * (_sh(u, -1, 0) - 2.0 * u + _sh(u, 1, 0)) * dxi**2
        + nu * (_sh(u, 0, -1) - 2.0 * u + _sh(u, 0, 1)) * dyi**2
        - u * dudx
        - v_here * dudy
        + fl.gx
        + fx_kappa * 2.0 / (rho + _sh(rho, -1, 0))
    )

    u_here = 0.25 * (_sh(u, 0, -1) + u + _sh(u, 1, -1) + _sh(u, 1, 0))
    dvdx = jnp.where(u_here > 0, (v - _sh(v, -1, 0)) * dxi, (_sh(v, 1, 0) - v) * dxi)
    dvdy = jnp.where(v > 0, (v - _sh(v, 0, -1)) * dyi, (_sh(v, 0, 1) - v) * dyi)
    kap_v = (kappa + _sh(kappa, 0, -1)) * 0.5
    fy_kappa = -fl.sigma * (F - _sh(F, 0, -1)) * kap_v / g.dy
    vs = v + dt * (
        nu * (_sh(v, -1, 0) - 2.0 * v + _sh(v, 1, 0)) * dxi**2
        + nu * (_sh(v, 0, -1) - 2.0 * v + _sh(v, 0, 1)) * dyi**2
        - u_here * dvdx
        - v * dvdy
        + fl.gy
        + fy_kappa * 2.0 / (rho + _sh(rho, 0, -1))
    )

    us = jnp.where(_region(shape, 2, g.nx + 1, 1, g.ny + 1, oi, oj), us, 0.0)
    vs = jnp.where(_region(shape, 1, g.nx + 1, 2, g.ny + 1, oi, oj), vs, 0.0)
    return us, vs, rho


def _predict_kernel(u_ref, v_ref, F_ref, us_out, vs_out, *, cfg: SimConfig):
    us, vs, _ = _predict_body(cfg, u_ref[:], v_ref[:], F_ref[:])
    us_out[:] = us
    vs_out[:] = vs


def pallas_predict(cfg: SimConfig, u, v, F, interpret: bool = False):
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    return pl.pallas_call(
        partial(_predict_kernel, cfg=cfg),
        out_shape=(shape, shape),
        in_specs=_vmem_specs(3),
        out_specs=tuple(_vmem_specs(2)),
        compiler_params=_compiler_params(F, 28),
        interpret=interpret,
    )(u, v, F)


# ----------------------------------------------------------------------
# Windowed PHASE kernels: per-shard building blocks of the distributed
# HYBRID step (parallel/dist._local_step_hybrid). Same phase bodies as
# the serial hybrid's kernels, with every mask at GLOBAL indices, so the
# DISTRIBUTED residual-driven pressure solve (rbsor / parallel/mg) can
# run as XLA between Pallas phases exactly like solver._step_pallas
# hosts the serial one. PHASE_HALO is each phase's exact L-inf
# dependency radius: predict reads F through normals->curvature->
# momentum at distance <= 3; one FCT sweep reads F/vel at axis distance
# <= 3 through Ftd->limiter->corrected flux (2dvof.py:198-309, 321-448).
# A block widened by PHASE_HALO neighbor planes beyond its ghost ring
# therefore yields outputs valid on the own block INCLUDING the ring —
# the ring values equal what a post-phase exchange would have delivered
# (the neighbor computes the identical expression on the same operands).
# ----------------------------------------------------------------------
PHASE_HALO = 3


def _sanitized_win(g: Grid2D, oi, oj, fields):
    """Zero values outside the GLOBAL ghost-included domain [0, n+2):
    the widened margins beyond a wall shard are zero-filled by
    parallel/dist._widen already, but sanitizing at load keeps the phase
    kernels junk-proof (0*NaN=NaN otherwise) like _win_step_values."""
    shape = fields[0].shape
    row = _iota(shape, 0) + oi
    col = _iota(shape, 1) + oj
    valid = ((row >= 0) & (row <= g.nx + 1)
             & (col >= 0) & (col <= g.ny + 1))
    return [jnp.where(valid, a, 0.0) for a in fields]


def _predict_win_kernel(oi_ref, oj_ref, u_ref, v_ref, F_ref,
                        us_out, vs_out, *, cfg: SimConfig):
    oi = oi_ref[0, 0]
    oj = oj_ref[0, 0]
    u, v, F = _sanitized_win(cfg.grid, oi, oj,
                             [u_ref[:], v_ref[:], F_ref[:]])
    us, vs, _ = _predict_body(cfg, u, v, F, oi, oj)
    us_out[:] = us
    vs_out[:] = vs


def pallas_predict_win(cfg: SimConfig, u, v, F, oi, oj,
                       interpret: bool = False):
    """Fused materials+normals+curvature+momentum predictor on a
    halo-extended block; (oi, oj) are traced global indices of the block
    origin. Returns full extended (u_star, v_star) — callers keep
    [W:-W, W:-W] with W = PHASE_HALO."""
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    oi = jnp.asarray(oi, jnp.int32).reshape(1, 1)
    oj = jnp.asarray(oj, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        partial(_predict_win_kernel, cfg=cfg),
        out_shape=(shape, shape),
        in_specs=[smem, smem] + _vmem_specs(3),
        out_specs=tuple(_vmem_specs(2)),
        compiler_params=_compiler_params(F, 28),
        interpret=interpret,
    )(oi, oj, u, v, F)


def _sweep_win_kernel(oi_ref, oj_ref, F_ref, vel_ref, out_ref, *,
                      cfg: SimConfig, axis: int):
    g, nm = cfg.grid, cfg.num
    oi = oi_ref[0, 0]
    oj = oj_ref[0, 0]
    F, vel = _sanitized_win(g, oi, oj, [F_ref[:], vel_ref[:]])
    if axis == 0:
        out_ref[:] = _sweep_body(g.dx, g.dy, nm.dt, nm.fct, 0, F, vel,
                                 n_axis=g.nx, n_other=g.ny,
                                 off_axis=oi, off_other=oj)
    else:
        out_ref[:] = _sweep_body(g.dy, g.dx, nm.dt, nm.fct, 1, F, vel,
                                 n_axis=g.ny, n_other=g.nx,
                                 off_axis=oj, off_other=oi)


def pallas_fct_sweep_win(cfg: SimConfig, F, vel, axis: int, oi, oj,
                         interpret: bool = False):
    """One FCT sweep (axis 0 = x with u, axis 1 = y with v) on a
    halo-extended block with global-index masks; keep [W:-W, W:-W]."""
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    oi = jnp.asarray(oi, jnp.int32).reshape(1, 1)
    oj = jnp.asarray(oj, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        partial(_sweep_win_kernel, cfg=cfg, axis=axis),
        out_shape=jax.ShapeDtypeStruct(F.shape, F.dtype),
        in_specs=[smem, smem] + _vmem_specs(2),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_compiler_params(F, 24),
        interpret=interpret,
    )(oi, oj, F, vel)


# ----------------------------------------------------------------------
# Whole-step mono-kernel: predict + projection + correction + both FCT
# sweeps + wall BCs in ONE kernel. HBM traffic per step collapses to the
# state pytree itself (4 reads + 4 writes).
# ----------------------------------------------------------------------
def _bc_mirrors(g: Grid2D, shape, oi=0, oj=0):
    """The two ghost-mirror closures of apply_bc's roll+mask form. Wall
    positions are GLOBAL indices (offset by oi/oj for the windowed
    per-shard kernel)."""
    row = _iota(shape, 0) + oi
    col = _iota(shape, 1) + oj
    i_hi = g.nx + 1
    j_hi = g.ny + 1

    def mirror_j(a):
        a = jnp.where(col == 0, _sh(a, 0, 1), a)
        return jnp.where(col == j_hi, _sh(a, 0, -1), a)

    def mirror_i(a):
        a = jnp.where(row == 0, _sh(a, 1, 0), a)
        return jnp.where(row == i_hi, _sh(a, -1, 0), a)

    return row, col, i_hi, j_hi, mirror_j, mirror_i


def _bc_u(g: Grid2D, u, oi=0, oj=0):
    row, _, i_hi, _, mirror_j, _ = _bc_mirrors(g, u.shape, oi, oj)
    u = mirror_j(u)
    return jnp.where((row == 1) | (row == i_hi), 0.0, u)


def _bc_v(g: Grid2D, v, oi=0, oj=0):
    _, col, _, j_hi, _, mirror_i = _bc_mirrors(g, v.shape, oi, oj)
    v = jnp.where((col == 1) | (col == j_hi), 0.0, v)
    return mirror_i(v)


def _bc_scal(g: Grid2D, a, oi=0, oj=0):
    _, _, _, _, mirror_j, mirror_i = _bc_mirrors(g, a.shape, oi, oj)
    return mirror_i(mirror_j(a))


def _bc_values(g: Grid2D, u, v, F, p, oi=0, oj=0):
    """apply_bc as a pure value function (exact serial corner ordering:
    j-boundaries first, then i-boundaries reading the updated values).
    Each field's BC reads only that field, so the per-field pieces above
    can also be applied staggered (the DMA-overlapped mono kernel stores
    each field as soon as its BC lands) with identical results."""
    return (_bc_u(g, u, oi, oj), _bc_v(g, v, oi, oj),
            _bc_scal(g, F, oi, oj), _bc_scal(g, p, oi, oj))


def _fullstep_kernel(F_ref, u_ref, v_ref, p_ref,
                     F_out, u_out, v_out, p_out,
                     *, cfg: SimConfig, even_step: bool):
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    F = F_ref[:]
    u = u_ref[:]
    v = v_ref[:]
    shape = F.shape
    dt = nm.dt

    # --- predict (includes materials + normals + curvature) ---
    us, vs, rho = _predict_body(cfg, u, v, F)

    # --- projection: rhs + N Jacobi iterations on the output ref ---
    rhs = (
        rho[1:-1, 1:-1]
        / dt
        * (
            (us[2:, 1:-1] - us[1:-1, 1:-1]) * g.dxi
            + (vs[1:-1, 2:] - vs[1:-1, 1:-1]) * g.dyi
        )
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

    lax.fori_loop(0, nm.n_jacobi, body, 0, unroll=True)
    p = p_out[:]

    # --- velocity correction (full-shape; wall faces keep entry values) ---
    r_u = (rho + _sh(rho, -1, 0)) * 0.5
    u_corr = us - dt / r_u * (p - _sh(p, -1, 0)) * g.dxi
    u = jnp.where(_region(shape, 2, g.nx + 1, 1, g.ny + 1), u_corr, u)
    r_v = (rho + _sh(rho, 0, -1)) * 0.5
    v_corr = vs - dt / r_v * (p - _sh(p, 0, -1)) * g.dyi
    v = jnp.where(_region(shape, 1, g.nx + 1, 2, g.ny + 1), v_corr, v)

    # --- Rudman double sweep (parity-ordered) + clamp ---
    if even_step:
        F = _sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v)
        F = _sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u)
    else:
        F = _sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u)
        F = _sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v)
    F = clamp01(F)

    # --- end-of-step wall BCs ---
    u, v, F, p = _bc_values(g, u, v, F, p)
    F_out[:] = F
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p


def pallas_fullstep(cfg: SimConfig, F, u, v, p, even_step: bool,
                    interpret: bool = False):
    """One lean solver step as a single VMEM-resident kernel."""
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    return pl.pallas_call(
        partial(_fullstep_kernel, cfg=cfg, even_step=even_step),
        out_shape=(shape,) * 4,
        in_specs=_vmem_specs(4),
        out_specs=tuple(_vmem_specs(4)),
        compiler_params=_compiler_params(F, 40),
        interpret=interpret,
    )(F, u, v, p)


def _fullstep_dma_kernel(F_hbm, u_hbm, v_hbm, p_hbm,
                         F_o, u_o, v_o, p_o,
                         Fb, ub, vb, pb, isems, osems,
                         *, cfg: SimConfig, even_step: bool):
    """_fullstep_kernel with explicit DMA I/O instead of VMEM windows.

    MEASURED NEGATIVE RESULT — kept as the record (BASELINE.md, round
    5): 125.8 vs 126.5/123.5 us/step at 512^2 (0.995x, inside session
    drift; scripts/tpu_mono_dma_ab.py), trajectory bit-identical over
    500 compiled steps. The motivating theory: the remainder A/B
    (scripts/tpu_2d_remainder_ab.py) measured a copy-only kernel with
    the same window I/O at ~51 of ~126 us/step, so starting the loads
    together (p's completes under predict) and storing each output the
    moment its field+BC is final (p under correct+sweeps, u/v under the
    sweeps, F last) should reclaim most of it. It reclaims nothing —
    consistent with the round-3 multi-step A/B (4 steps/launch, 1/4 the
    window I/O, flat): in a scan of compute-heavy kernels Mosaic already
    overlaps the window traffic with adjacent launches' compute, and the
    copy-only floor only measures what an EMPTY kernel cannot hide. The
    window form stays the production mono path; the BC-per-field split
    this variant exercises (_bc_u/_bc_v/_bc_scal) is shared with it.
    """
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    dt = nm.dt

    cF = pltpu.make_async_copy(F_hbm, Fb, isems.at[0])
    cu = pltpu.make_async_copy(u_hbm, ub, isems.at[1])
    cv = pltpu.make_async_copy(v_hbm, vb, isems.at[2])
    cp = pltpu.make_async_copy(p_hbm, pb, isems.at[3])
    for c in (cF, cu, cv, cp):
        c.start()
    cF.wait()
    cu.wait()
    cv.wait()
    F = Fb[:]
    u = ub[:]
    v = vb[:]
    shape = F.shape

    # --- predict (includes materials + normals + curvature) ---
    us, vs, rho = _predict_body(cfg, u, v, F)

    # --- projection: rhs + N Jacobi iterations in the p staging buffer ---
    rhs = (
        rho[1:-1, 1:-1]
        / dt
        * (
            (us[2:, 1:-1] - us[1:-1, 1:-1]) * g.dxi
            + (vs[1:-1, 2:] - vs[1:-1, 1:-1]) * g.dyi
        )
    )
    ae, aw, an, a_s, ap_inv = _inline_poisson_coeffs(g, F.dtype)
    cp.wait()

    def body(_, carry):
        p_int = (
            rhs
            - ae * pb[2:, 1:-1]
            - aw * pb[:-2, 1:-1]
            - an * pb[1:-1, 2:]
            - a_s * pb[1:-1, :-2]
        ) * ap_inv
        pb[1:-1, 1:-1] = p_int
        return carry

    lax.fori_loop(0, nm.n_jacobi, body, 0, unroll=True)
    p = pb[:]
    # p is final up to its ghost mirrors, which the correction never
    # reads (its regions exclude every ghost-adjacent read): BC + store
    # now, hidden under correct + sweeps
    pb[:] = _bc_scal(g, p)
    sp = pltpu.make_async_copy(pb, p_o, osems.at[3])
    sp.start()

    # --- velocity correction (full-shape; wall faces keep entry values) ---
    r_u = (rho + _sh(rho, -1, 0)) * 0.5
    u_corr = us - dt / r_u * (p - _sh(p, -1, 0)) * g.dxi
    u = jnp.where(_region(shape, 2, g.nx + 1, 1, g.ny + 1), u_corr, u)
    r_v = (rho + _sh(rho, 0, -1)) * 0.5
    v_corr = vs - dt / r_v * (p - _sh(p, 0, -1)) * g.dyi
    v = jnp.where(_region(shape, 1, g.nx + 1, 2, g.ny + 1), v_corr, v)
    # the sweeps read the PRE-BC u/v values (kernel order unchanged);
    # the BC'd copies go to HBM under the sweep compute
    ub[:] = _bc_u(g, u)
    vb[:] = _bc_v(g, v)
    su = pltpu.make_async_copy(ub, u_o, osems.at[1])
    sv = pltpu.make_async_copy(vb, v_o, osems.at[2])
    su.start()
    sv.start()

    # --- Rudman double sweep (parity-ordered) + clamp ---
    if even_step:
        F = _sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v)
        F = _sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u)
    else:
        F = _sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u)
        F = _sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v)
    F = clamp01(F)

    Fb[:] = _bc_scal(g, F)
    sF = pltpu.make_async_copy(Fb, F_o, osems.at[0])
    sF.start()
    sF.wait()
    su.wait()
    sv.wait()
    sp.wait()


def pallas_fullstep_dma(cfg: SimConfig, F, u, v, p, even_step: bool,
                        interpret: bool = False):
    """One lean solver step, single kernel, DMA-overlapped state I/O
    (see _fullstep_dma_kernel). Bit-identical to pallas_fullstep."""
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    return pl.pallas_call(
        partial(_fullstep_dma_kernel, cfg=cfg, even_step=even_step),
        out_shape=(shape,) * 4,
        in_specs=[hbm] * 4,
        out_specs=(hbm,) * 4,
        scratch_shapes=[pltpu.VMEM(F.shape, F.dtype) for _ in range(4)]
        + [pltpu.SemaphoreType.DMA((4,)), pltpu.SemaphoreType.DMA((4,))],
        compiler_params=_compiler_params(F, 40),
        interpret=interpret,
    )(F, u, v, p)


# ----------------------------------------------------------------------
# Windowed whole-step kernel: the per-shard engine of the distributed
# pallas path (VERDICT r1 #3). A shard ships ONE wide halo covering the
# entire lean step's dependency cone (predict 3 + rhs 1 + n_jacobi + 
# correct 1 + two sweeps 3+3), runs this kernel on the extended block with
# every mask evaluated at GLOBAL indices, and keeps only the fully-valid
# center. Junk INSIDE the global domain (a neighbor's cone margin) erodes
# inward at most one cell per stencil pass and never reaches the kept
# region; junk OUTSIDE the global domain is zeroed at load
# (_win_step_values), so even NaN/Inf buffer garbage (the strip engine's
# unwritten resident margins) cannot leak through 0*junk contributions.
# Serial kernels are the oi=oj=0 special case of the same bodies
# (bit-identical masks).
# ----------------------------------------------------------------------
def step_halo_width(cfg: SimConfig) -> int:
    """L-inf dependency radius of one lean step."""
    return cfg.num.n_jacobi + 12


def _win_step_values(cfg: SimConfig, even_step: bool, oi, oj,
                     F, u, v, p_init, p_ref):
    """The windowed lean-step computation on loaded block VALUES — the
    shared body of the one-shot windowed kernel (_fullstep_win_kernel)
    and the strip-streaming kernel (_fullstep_strips_kernel). ``p_ref``
    is a VMEM ref used for the in-place Jacobi iteration (the caller's p
    output buffer, or a scratch in the streaming kernel). Returns
    (u, v, F, p) block values (the _bc_values order)."""
    g, fl, nm = cfg.grid, cfg.fluid, cfg.num
    shape = F.shape
    dt = nm.dt

    # Sanitize the cone margin at load: values outside the GLOBAL
    # ghost-included domain [0, n+2) are junk (zero pad in the tiled
    # engine, neighbor-wrap in the distributed one, UNINITIALIZED buffer
    # rows in the strip engine's resident layout). Finite junk is inert
    # under the global masks (0*junk contributions), but NaN/Inf junk is
    # not (0*NaN=NaN, max(x,NaN)=NaN) — zeroing here makes every engine
    # junk-proof and is bit-neutral for the others (their margins were
    # already zeros or provably non-contributing).
    row = _iota(shape, 0) + oi
    col = _iota(shape, 1) + oj
    valid = ((row >= 0) & (row <= g.nx + 1)
             & (col >= 0) & (col <= g.ny + 1))
    F = jnp.where(valid, F, 0.0)
    u = jnp.where(valid, u, 0.0)
    v = jnp.where(valid, v, 0.0)
    p_init = jnp.where(valid, p_init, 0.0)

    us, vs, rho = _predict_body(cfg, u, v, F, oi, oj)

    rhs = (
        rho[1:-1, 1:-1]
        / dt
        * (
            (us[2:, 1:-1] - us[1:-1, 1:-1]) * g.dxi
            + (vs[1:-1, 2:] - vs[1:-1, 1:-1]) * g.dyi
        )
    )
    ae, aw, an, a_s, ap_inv = _inline_poisson_coeffs(
        g, p_init.dtype, shape_int=(shape[0] - 2, shape[1] - 2), oi=oi, oj=oj)
    p_ref[:] = p_init

    def body(_, carry):
        p_int = (
            rhs
            - ae * p_ref[2:, 1:-1]
            - aw * p_ref[:-2, 1:-1]
            - an * p_ref[1:-1, 2:]
            - a_s * p_ref[1:-1, :-2]
        ) * ap_inv
        p_ref[1:-1, 1:-1] = p_int
        return carry

    lax.fori_loop(0, nm.n_jacobi, body, 0, unroll=True)
    p = p_ref[:]

    r_u = (rho + _sh(rho, -1, 0)) * 0.5
    u_corr = us - dt / r_u * (p - _sh(p, -1, 0)) * g.dxi
    u = jnp.where(_region(shape, 2, g.nx + 1, 1, g.ny + 1, oi, oj), u_corr, u)
    r_v = (rho + _sh(rho, 0, -1)) * 0.5
    v_corr = vs - dt / r_v * (p - _sh(p, 0, -1)) * g.dyi
    v = jnp.where(_region(shape, 1, g.nx + 1, 2, g.ny + 1, oi, oj), v_corr, v)

    def sweep_x(F):
        return _sweep_body(g.dx, g.dy, dt, nm.fct, 0, F, u,
                           n_axis=g.nx, n_other=g.ny,
                           off_axis=oi, off_other=oj)

    def sweep_y(F):
        return _sweep_body(g.dy, g.dx, dt, nm.fct, 1, F, v,
                           n_axis=g.ny, n_other=g.nx,
                           off_axis=oj, off_other=oi)

    if even_step:
        F = sweep_y(F)
        F = sweep_x(F)
    else:
        F = sweep_x(F)
        F = sweep_y(F)
    F = clamp01(F)

    return _bc_values(g, u, v, F, p, oi, oj)


def _fullstep_win_kernel(oi_ref, oj_ref, F_ref, u_ref, v_ref, p_ref,
                         F_out, u_out, v_out, p_out,
                         *, cfg: SimConfig, even_step: bool):
    oi = oi_ref[0, 0]
    oj = oj_ref[0, 0]
    u, v, F, p = _win_step_values(
        cfg, even_step, oi, oj, F_ref[:], u_ref[:], v_ref[:], p_ref[:],
        p_out)
    F_out[:] = F
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p


def strips_layout_2d(cfg: SimConfig, tx: int | None = None,
                     extents: tuple[int, int] | None = None):
    """Static geometry of the strip-streamed whole-step engine
    (pallas_fullstep_strips), or None when no full-width strip both
    divides nx and fits VMEM. ``tx`` restricts the candidate strip
    heights to that single value (tests / tuning: small grids otherwise
    pick a single whole-grid strip, leaving the multi-strip streaming
    paths unexercised). ``extents`` = (rows, lanes) interior extents to
    lay out instead of the global grid — the distributed shard engine
    streams each shard's LOCAL block (nxl, nyl).

    Returns (Tx, W2, P0, P1, Exp, Lout, ntx):
      W2   — halo width rounded up to the sublane grid (ceil8 of the
             true L-inf cone), so every strip DMA has 8-aligned row
             starts AND every staged row is inside the validity cone
             (staged rows [W2, W2+Tx+8) ⊂ [W, Exp-W) since W2 >= W)
      P0/P1 — padded array extents: rows nx+2+2*W2 grown so the last
             window fits, lanes rounded to 128
      Exp  — window rows per strip (Tx + 2*W2 + 2, ceil8)
      Lout — rows written back per strip (Tx + 8; adjacent strips
             overlap by 8 rows of IDENTICAL fully-valid values, so the
             async out-DMAs may complete in any order)
    """
    if tx is not None and (tx <= 0 or tx % 8):
        # the layout's invariants need 8-aligned strip heights: in-DMA
        # row starts c*Tx must sit on the sublane grid, and the staged
        # rows [W2, W2+Tx+8) stay inside the validity cone [W, Exp-W)
        # only because ceil8(Tx+2*W2+2) = Tx+2*W2+8 for 8|Tx — a stray
        # tx=12 would stage not-fully-valid rows whose 8-row strip
        # overlaps are no longer identical (nondeterministic out-DMA
        # completion order would then pick arbitrary winners)
        raise ValueError(f"strip height tx={tx} must be a positive "
                         "multiple of 8")
    g = cfg.grid
    rows, lanes = extents if extents is not None else (g.nx, g.ny)
    W = step_halo_width(cfg)
    W2 = ((W + 7) // 8) * 8
    P1 = ((lanes + 2 + 2 * W2 + 127) // 128) * 128
    candidates = (1024, 512, 256, 128, 64, 32, 16, 8) if tx is None \
        else (tx,)
    for Tx in candidates:
        if rows % Tx:
            continue
        Exp = ((Tx + 2 * W2 + 2 + 7) // 8) * 8
        Lout = Tx + 8
        # measured footprint model: ~27 field-equivalent temporaries at
        # the window shape (the windowed body; see fits_vmem_2d) + the
        # double-buffered in/out scratch
        need = (27 * Exp + 8 * Lout) * P1 * 4
        if need <= 116 * 2**20:
            P0 = rows - Tx + Exp
            return Tx, W2, P0, P1, Exp, Lout, rows // Tx
    return None


def pad_to_strips(lay, a):
    """Embed a ghost-included block at offset (W2, W2) of the strip
    engine's (P0, P1) resident layout; the zero surround is inert (out-
    of-domain junk is sanitized at load; a shard's in-domain margins are
    halo-refreshed before every kernel). Shared by the serial engine
    (solver) and the distributed shard engine (parallel.dist)."""
    _Tx, W2, P0, P1, *_ = lay
    return jnp.zeros((P0, P1), a.dtype).at[
        W2:W2 + a.shape[0], W2:W2 + a.shape[1]].set(a)


def _fullstep_strips_kernel(oi0_ref, oj0_ref,
                            F_hbm, u_hbm, v_hbm, p_hbm,
                            F_out, u_out, v_out, p_out,
                            Fb, ub, vb, pb, pwork,
                            Fs, us_, vs_, ps_, sems, osems,
                            *, cfg: SimConfig, even_step: bool, Tx: int,
                            W2: int, Exp: int, Lout: int, ntx: int):
    """Double-buffered strip loop (the 2-D analog of step3d's slab
    kernels): strip c's window [c*Tx, c*Tx+Exp) is DMA'd HBM->VMEM while
    strip c-1 computes; the windowed step body runs on the loaded block
    with global origin (oi0 + c*Tx - W2, oj0 - W2) — (oi0, oj0) are the
    traced global indices of the streamed block's first ghost row/col
    (0 for the serial engine, the shard origin under shard_map); rows
    [W2, W2+Lout) — all inside the validity cone — are staged and DMA'd
    back. Row [0, W2) / tail padding of the outputs is never written:
    out-of-block junk, neutralized at the next step's load (sanitizer in
    _win_step_values / the shard halo refresh)."""
    oi0 = oi0_ref[0, 0]
    oj0 = oj0_ref[0, 0]
    ins = ((F_hbm, Fb), (u_hbm, ub), (v_hbm, vb), (p_hbm, pb))
    outs = ((Fs, F_out), (us_, u_out), (vs_, v_out), (ps_, p_out))

    def in_dma(slot, c, i):
        h, b = ins[i]
        return pltpu.make_async_copy(
            h.at[pl.ds(c * Tx, Exp)],
            b.at[pl.ds(slot * Exp, Exp)],
            sems.at[slot * 4 + i])

    def out_dma(slot, c, i):
        b, h = outs[i]
        return pltpu.make_async_copy(
            b.at[pl.ds(slot * Lout, Lout)],
            h.at[pl.ds(c * Tx + W2, Lout)],
            osems.at[slot * 4 + i])

    for i in range(4):
        in_dma(0, 0, i).start()

    def body(c, carry):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < ntx)
        def _():
            for i in range(4):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

        for i in range(4):
            in_dma(slot, c, i).wait()

        s0 = slot * Exp
        u, v, F, p = _win_step_values(
            cfg, even_step, oi0 + c * Tx - W2, oj0 - W2,
            Fb[pl.ds(s0, Exp)], ub[pl.ds(s0, Exp)], vb[pl.ds(s0, Exp)],
            pb[pl.ds(s0, Exp)], pwork)

        # the staging slot was last used by strip c-2: drain its out-DMA
        @pl.when(c >= 2)
        def _():
            for i in range(4):
                out_dma(slot, c - 2, i).wait()

        for (b, _h), val in zip(outs, (F, u, v, p)):
            b[pl.ds(slot * Lout, Lout)] = lax.slice_in_dim(
                val, W2, W2 + Lout, axis=0)
        for i in range(4):
            out_dma(slot, c, i).start()
        return carry

    lax.fori_loop(0, ntx, body, 0)
    for c in range(max(0, ntx - 2), ntx):
        for i in range(4):
            out_dma(c % 2, c, i).wait()


def pallas_fullstep_strips(cfg: SimConfig, F, u, v, p, even_step: bool,
                           interpret: bool = False, tx: int | None = None,
                           extents: tuple[int, int] | None = None,
                           oi0=0, oj0=0):
    """One lean step on W2-padded fields (strips_layout_2d layout),
    resident in HBM: the whole step for ANY grid height in ONE kernel
    launch, with the window DMA overlapped behind the previous strip's
    compute — no XLA-level window slicing (the tiled loop engine's
    dynamic_slice/dynamic_update_slice round trips). Inputs and outputs
    are (P0, P1) arrays; rows [W2, W2+rows+2) x cols [W2, W2+lanes+2)
    carry the streamed block; everything outside is inert junk (serial)
    or neighbor halo (the distributed shard engine, which passes the
    shard's traced global origin (oi0, oj0) and its local ``extents``)."""
    lay = strips_layout_2d(cfg, tx=tx, extents=extents)
    if lay is None:
        raise ValueError("no strip layout fits VMEM for this grid")
    Tx, W2, P0, P1, Exp, Lout, ntx = lay
    assert F.shape == (P0, P1), (F.shape, (P0, P1))
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    blk = lambda n: pltpu.VMEM((n, P1), F.dtype)  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
           for _ in range(4)]
    oi0 = jnp.asarray(oi0, jnp.int32).reshape(1, 1)
    oj0 = jnp.asarray(oj0, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        partial(_fullstep_strips_kernel, cfg=cfg, even_step=even_step,
                Tx=Tx, W2=W2, Exp=Exp, Lout=Lout, ntx=ntx),
        out_shape=(shape,) * 4,
        in_specs=[smem, smem] + hbm,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            for _ in range(4)),
        scratch_shapes=[
            blk(2 * Exp), blk(2 * Exp), blk(2 * Exp), blk(2 * Exp),
            blk(Exp),                                  # Jacobi work buffer
            blk(2 * Lout), blk(2 * Lout), blk(2 * Lout), blk(2 * Lout),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(oi0, oj0, F, u, v, p)


def pallas_fullstep_win(cfg: SimConfig, F, u, v, p, oi, oj,
                        even_step: bool, interpret: bool = False):
    """One lean step on a halo-extended block; (oi, oj) are traced global
    indices of the block origin. Returns the full extended block — callers
    keep [W:-W, W:-W] with W = step_halo_width(cfg)."""
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    oi = jnp.asarray(oi, jnp.int32).reshape(1, 1)
    oj = jnp.asarray(oj, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        partial(_fullstep_win_kernel, cfg=cfg, even_step=even_step),
        out_shape=(shape,) * 4,
        in_specs=[smem, smem] + _vmem_specs(4),
        out_specs=tuple(_vmem_specs(4)),
        compiler_params=_compiler_params(F, 40),
        interpret=interpret,
    )(oi, oj, F, u, v, p)
