"""Slab-tiled 3-D Pallas kernels: the fused hot path for the 200^3 workload.

The XLA 3-D path collapses to ~70 GB/s effective on every shifted-slice
stencil pass (BASELINE.md bottleneck analysis), which caps the reference's
flagship 200^3 dam break (3dvof.py:20-22) at 0.19e9 cell-updates/s. These
kernels stream i-axis slabs of the (nx+2, ny+2, nz+2) volumes through VMEM
with manual halo DMA, so each phase costs one HBM round trip at full
bandwidth instead of one ~70 GB/s pass per shifted operand:

  - predict3d:   materials + upwind momentum predictor (u*, v*, w*) + the
                 projection rhs, fused (3dvof.py:207-283). Surface-tension
                 terms are omitted: the reference's 3-D normals kernel is
                 commented out (3dvof.py:304-332), kappa is identically
                 zero, and the sigma terms contribute an exact +0.0.
  - jacobi3d (sibling module, chunked rewrite): all n_jacobi iterations on
                 a VMEM-resident pressure volume.
  - correct3d:   velocity correction u = u* - dt/rho_face * grad p
                 (3dvof.py:286-302).
  - fct sweeps:  each full 4-pass Rudman/Zalesak sweep as one kernel
                 (3dvof.py:366-541), sweep direction x/y/z.

Slab scheme: interior planes i in [1, nx] are processed in chunks of B
planes (B = largest of 8/4/2 dividing nx, _pick_chunk). Inputs live in HBM
(`pltpu.MemorySpace.HBM`); each chunk DMAs an extended block (chunk + stencil halo in
i) into VMEM scratch, computes in full-shape roll+mask form (the only form
Mosaic supports here — no scatter/dynamic_update_slice, see
step_kernels.py docstring), and DMAs the B result planes back. In-plane
(j/k) neighbor access is jnp.roll whose wrap junk lands in ghost positions
that the region masks zero out. The x-direction FCT sweep needs a 3-plane
i-halo; its first/last chunks use clamped extended blocks with static
in-block offsets so every ref slice stays in bounds.

All five kernels double-buffer (pallas guide, Patterns/Double Buffering):
scratch holds two slots addressed as rows [slot*E, (slot+1)*E); chunk c+1's
input DMA is issued before chunk c's compute and chunk c's output DMA
drains while c+1 computes, so the HBM round trips hide behind the VPU
work. Slots are addressed with pl.ds(traced_start, static_size) loads and
stores — the one dynamic-indexing form Mosaic supports here (the same
pattern the chunked Jacobi uses).

Boundary conditions live inside the kernels (no per-step XLA surface
pass — it cost 1.8 ms/step at 200^3): predict reconstructs set_BC's
velocity wall/ghost values on its loaded blocks (_bc_fix_uvw), and the
step's last FCT sweep writes fresh F ghost mirrors (mirror_out); see
solver3d._step_3d_pallas_padded for the full equivalence argument.

Every kernel is parameterized over (nloc, gi_base): local plane l has
GLOBAL i-index gi_base + l, and all masks are global, so the distributed
wide-halo engine (parallel/dist3d.py) runs the identical kernels on
extended shard blocks — the serial path is the gi_base=0 special case.
gi_base rides in as an SMEM scalar because the shard offset is traced
under shard_map.

Numerics mirror ops/momentum3d.py and ops/fct3d.py expression-for-
expression; equivalence against the XLA path is pinned by
tests/test_3d.py (interpret mode on CPU, f64) and the TPU-gated compiled
tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Fluid
from ..grid import Grid3D
from ..ops import mix_properties
from ..ops.common import clamp01
from ..ops.fct3d import (
    sweep_inplane_masked,
    sweep_masked_2axis,
    sweep_x_masked,
)

__all__ = [
    "step3d_slab_supported",
    "pallas_predict3d_rhs",
    "pallas_correct3d",
    "pallas_fct3d_sweep",
]


#: B=8 is proven to 208x384 padded planes (200^3, the A/B winner —
#: BASELINE.md); at 264x384 (256^3) its predict kernel needed 165 MB of
#: VMEM (97 MB working set + 103 MB register-allocator SPILLS the block
#: estimate cannot model — they are a compiler artifact, not a buffer
#: count) and failed the remote compile. Above this plane size B caps at
#: 4, which compiles and runs all three kernel families at 256^3
#: (scripts/tpu_256_chunk_probe.py).
_B8_PLANE_LIMIT = 340_000


def _pick_chunk(nx: int, plane_bytes: int | None = None) -> int | None:
    """Largest slab thickness B in (8, 4, 2) with nx % B == 0 and at least
    3 chunks (the FCT x-sweep special-cases the first/last chunk); big
    padded planes skip B=8 (_B8_PLANE_LIMIT)."""
    for b in (8, 4, 2):
        if b == 8 and plane_bytes is not None \
                and plane_bytes > _B8_PLANE_LIMIT:
            continue
        if nx % b == 0 and nx // b >= 3:
            return b
    return None


def _plane_bytes(shape) -> int:
    """Padded plane footprint of a (n0, n1p, n2p) volume, f32."""
    return int(shape[1]) * int(shape[2]) * 4


def step3d_slab_supported(g: Grid3D, csf: bool = False) -> bool:
    """Whether the slab kernels can run this grid: a valid chunk size and a
    per-chunk working set that fits VMEM (it always does for plane sizes up
    to ~1024^2, far beyond the reference's workloads). Uses the PADDED
    plane (lane/sublane, solver3d._pad_jk) — what the kernels actually
    stream — so the B choice here matches the runtime pick."""
    plane = (g.ny + 2 + (-(g.ny + 2)) % 8) \
        * (g.nz + 2 + (-(g.nz + 2)) % 128) * 4
    b = _pick_chunk(g.nx, plane)
    if b is None:
        return False
    # predict3d holds ~20 chunk-sized blocks live (4 ext inputs + 4 outputs
    # + temporaries); csf adds the wider halo and the normals temporaries
    blocks, hw2 = (28, 6) if csf else (20, 4)
    return blocks * (b + hw2) * plane <= 100 * 2**20


def _vmem_params(nbytes: int) -> pltpu.CompilerParams:
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(max(int(nbytes), 16 * 2**20), 124 * 2**20)
    )


def _any_specs(n):
    # big volumes are pinned to HBM: `ANY` lets the compiler put them in
    # VMEM, which OOMs at 128^3+ (the kernels DMA slabs manually)
    return [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM) for _ in range(n)]


def _copy(src, dst, sem):
    dma = pltpu.make_async_copy(src, dst, sem)
    dma.start()
    return dma


def _sh3(x, di=0, dj=0, dk=0):
    """x[i+di, j+dj, k+dk] with wrap-around; callers mask the junk."""
    if di:
        x = jnp.roll(x, -di, axis=0)
    if dj:
        x = jnp.roll(x, -dj, axis=1)
    if dk:
        x = jnp.roll(x, -dk, axis=2)
    return x


def _iota3(shape, axis):
    return lax.broadcasted_iota(jnp.int32, shape, axis)


def _bc_fix_uvw(g: Grid3D, u, v, w, gi, gj=None):
    """Reconstruct set_BC's wall/ghost velocity values (ops/bc.py order:
    y-faces, then x, then z — the order is load-bearing at corners) on
    loaded blocks, so the streamed state never needs a whole-volume XLA BC
    pass between steps (it cost 1.8 ms/step at 200^3, 30% of the step).
    Bit-exact: each fix copies or zeroes exactly the positions set_BC
    writes, in the same order, as a pure function of interior values —
    which are identical between the paths by induction.

    gj: GLOBAL j-index array for the (x,y)-pencil engine (local row m
    holds global j gj_base + m, so the y-wall fixes land mid-block on
    y-edge shards and nowhere on interior shards). None = serial/slab
    (local j IS global j) — the trace is unchanged."""
    shape = u.shape
    j = _iota3(shape, 1) if gj is None else gj
    k = _iota3(shape, 2)
    jm, km, im = g.ny + 1, g.nz + 1, g.nx + 1

    def ymirror(x):
        x = jnp.where(j == 0, _sh3(x, 0, 1, 0), x)
        return jnp.where(j == jm, _sh3(x, 0, -1, 0), x)

    def zmirror(x):
        x = jnp.where(k == 0, _sh3(x, 0, 0, 1), x)
        return jnp.where(k == km, _sh3(x, 0, 0, -1), x)

    def imirror(x):
        x = jnp.where(gi == 0, _sh3(x, 1, 0, 0), x)
        return jnp.where(gi == im, _sh3(x, -1, 0, 0), x)

    u = ymirror(u)
    u = jnp.where((gi == 1) | (gi == im), 0.0, u)
    u = zmirror(u)

    v = jnp.where((j == 1) | (j == jm), 0.0, v)
    v = imirror(v)
    v = zmirror(v)

    w = ymirror(w)
    w = imirror(w)
    w = jnp.where((k == 1) | (k == km), 0.0, w)
    return u, v, w


def _mirror_jk(g: Grid3D, x, gj=None, njl=None):
    """F ghost mirrors in set_BC's y-then-z face order; the x-face ghost
    planes are whole-plane copies done by the caller's plane DMAs (the
    orders commute plane-wise, so copy-then-z and z-then-copy agree).

    gj: GLOBAL j-index array for the pencil engine — the y mirrors then
    land only at the true walls (mid-block on y-edge shards); interior
    shards' block-edge rows are refreshed from neighbors instead. njl
    bounds the writes to the non-pad rows: a near-top pencil's sublane
    pad rows can alias gj == ny+1 (e.g. nyl == Wy+1), and F is
    PERSISTENT state whose pad must stay zero. None = serial/slab
    (unchanged trace)."""
    shape = x.shape
    k = _iota3(shape, 2)
    if gj is None:
        j = _iota3(shape, 1)
        x = jnp.where(j == 0, _sh3(x, 0, 1, 0), x)
        x = jnp.where(j == g.ny + 1, _sh3(x, 0, -1, 0), x)
    else:
        lv = _iota3(shape, 1) <= njl + 1
        x = jnp.where((gj == 0) & lv, _sh3(x, 0, 1, 0), x)
        x = jnp.where((gj == g.ny + 1) & lv, _sh3(x, 0, -1, 0), x)
    x = jnp.where(k == 0, _sh3(x, 0, 0, 1), x)
    x = jnp.where(k == g.nz + 1, _sh3(x, 0, 0, -1), x)
    return x


# ----------------------------------------------------------------------
# predict3d: materials + momentum predictor + projection rhs
# ----------------------------------------------------------------------
def _predict_block(g: Grid3D, fl: Fluid, dt, u, v, w, F, gi0, gj0=None,
                   csf: bool = False):
    """Predictor + rhs over an extended block whose plane l has global
    i-index gi0 + l. Returns (us, vs, ws, rhs) in block shape with the XLA
    path's zeros outside the update regions. Planes within stencil reach of
    the block's i-edges are junk; callers only store planes with a full
    halo.

    gj0: global j of local row 0, for the pencil engine (the j masks
    become global; rows near the block's j-edges and in the sublane pad
    are junk — u*/v*/w*/rhs are per-step intermediates, so the junk is
    consumed only inside the step's dependency cone and needs no local
    mask). None = serial/slab (unchanged trace).

    csf=True fuses the 3-D Youngs normals + Brackbill curvature
    (ops/normals3d.py, the shared young_msum_3d expression core) and the
    sigma face terms of ops/momentum3d.py into the predictor — surface
    tension at slab-kernel speed, the capability the reference leaves
    disabled (3dvof.py:304-332,607). The F dependency cone widens from
    +-1 to +-3 planes (kappa at i±1 needs normals at i±2 needs F at
    i±3); the caller ships a B+6 extended block. The csf=False trace is
    byte-identical to before (golden/program-cache preservation)."""
    shape = F.shape
    dxi, dyi, dzi = g.dxi, g.dyi, g.dzi
    gi = _iota3(shape, 0) + gi0
    j = _iota3(shape, 1)
    if gj0 is not None:
        j = j + gj0
    k = _iota3(shape, 2)
    j_int = (j >= 1) & (j <= g.ny)
    k_int = (k >= 1) & (k <= g.nz)

    rho, nu = mix_properties(fl, F)

    if csf:
        from ..ops.normals3d import normalize_normals_3d, young_msum_3d

        # cell interior (global): matches the op's zero-ghost embed3
        m_int = (gi >= 1) & (gi <= g.nx) & j_int & k_int
        mxs, mys, mzs = young_msum_3d(
            lambda di, dj, dk: _sh3(F, di, dj, dk), g.dx, g.dy, g.dz)
        mxs = jnp.where(m_int, mxs, 0.0)
        mys = jnp.where(m_int, mys, 0.0)
        mzs = jnp.where(m_int, mzs, 0.0)
        mx, my, mz = normalize_normals_3d(mxs, mys, mzs)
        mx = jnp.where(m_int, mx, 0.0)
        my = jnp.where(m_int, my, 0.0)
        mz = jnp.where(m_int, mz, 0.0)
        kappa = -(
            (_sh3(mx, 1, 0, 0) - _sh3(mx, -1, 0, 0)) / (2.0 * g.dx)
            + (_sh3(my, 0, 1, 0) - _sh3(my, 0, -1, 0)) / (2.0 * g.dy)
            + (_sh3(mz, 0, 0, 1) - _sh3(mz, 0, 0, -1)) / (2.0 * g.dz)
        )
        kappa = jnp.where(m_int, kappa, 0.0)

    def U(di=0, dj=0, dk=0):
        return _sh3(u, di, dj, dk)

    def V(di=0, dj=0, dk=0):
        return _sh3(v, di, dj, dk)

    def W(di=0, dj=0, dk=0):
        return _sh3(w, di, dj, dk)

    # ---- u* (3dvof.py:211-241; without csf the sigma term is exactly 0,
    # kappa never written; with csf it mirrors ops/momentum3d.py)
    v_here = 0.25 * (V(-1, 0, 0) + V(-1, 1, 0) + V(0, 0, 0) + V(0, 1, 0))
    w_here = 0.25 * (W(-1, 0, 0) + W(-1, 0, 1) + W(0, 0, 0) + W(0, 0, 1))
    dudx = jnp.where(u > 0, (u - U(-1, 0, 0)) * dxi, (U(1, 0, 0) - u) * dxi)
    dudy = jnp.where(v_here > 0, (u - U(0, -1, 0)) * dyi, (U(0, 1, 0) - u) * dyi)
    dudz = jnp.where(w_here > 0, (u - U(0, 0, -1)) * dzi, (U(0, 0, 1) - u) * dzi)
    acc_u = (
        nu * (U(-1, 0, 0) - 2 * u + U(1, 0, 0)) * dxi**2
        + nu * (U(0, -1, 0) - 2 * u + U(0, 1, 0)) * dyi**2
        + nu * (U(0, 0, -1) - 2 * u + U(0, 0, 1)) * dzi**2
        - u * dudx - v_here * dudy - w_here * dudz
        + fl.gx
    )
    if csf:
        kap = (kappa + _sh3(kappa, -1, 0, 0)) * 0.5
        fx = -fl.sigma * (F - _sh3(F, -1, 0, 0)) * kap / g.dx
        acc_u = acc_u + fx * 2 / (rho + _sh3(rho, -1, 0, 0))
    us = u + dt * acc_u
    us = jnp.where((gi >= 2) & (gi <= g.nx) & j_int & k_int, us, 0.0)

    # ---- v* ----
    u_here = 0.25 * (U(0, -1, 0) + U(0, 0, 0) + U(1, -1, 0) + U(1, 0, 0))
    w_here = 0.25 * (W(0, -1, 1) + W(0, -1, 0) + W(0, 0, 0) + W(0, 0, 1))
    dvdx = jnp.where(u_here > 0, (v - V(-1, 0, 0)) * dxi, (V(1, 0, 0) - v) * dxi)
    dvdy = jnp.where(v > 0, (v - V(0, -1, 0)) * dyi, (V(0, 1, 0) - v) * dyi)
    dvdz = jnp.where(w_here > 0, (v - V(0, 0, -1)) * dzi, (V(0, 0, 1) - v) * dzi)
    acc_v = (
        nu * (V(-1, 0, 0) - 2 * v + V(1, 0, 0)) * dxi**2
        + nu * (V(0, -1, 0) - 2 * v + V(0, 1, 0)) * dyi**2
        + nu * (V(0, 0, -1) - 2 * v + V(0, 0, 1)) * dzi**2
        - u_here * dvdx - v * dvdy - w_here * dvdz
        + fl.gy
    )
    if csf:
        kap = (kappa + _sh3(kappa, 0, -1, 0)) * 0.5
        fy = -fl.sigma * (F - _sh3(F, 0, -1, 0)) * kap / g.dy
        acc_v = acc_v + fy * 2 / (rho + _sh3(rho, 0, -1, 0))
    vs = v + dt * acc_v
    vs = jnp.where(
        (gi >= 1) & (gi <= g.nx) & (j >= 2) & (j <= g.ny) & k_int, vs, 0.0
    )

    # ---- w* ----
    u_here = 0.25 * (U(1, 0, -1) + U(0, 0, -1) + U(1, 0, 0) + U(0, 0, 0))
    v_here = 0.25 * (V(0, 1, -1) + V(0, 0, -1) + V(0, 0, 0) + V(0, 1, 0))
    dwdx = jnp.where(u_here > 0, (w - W(-1, 0, 0)) * dxi, (W(1, 0, 0) - w) * dxi)
    dwdy = jnp.where(v_here > 0, (w - W(0, -1, 0)) * dyi, (W(0, 1, 0) - w) * dyi)
    dwdz = jnp.where(w > 0, (w - W(0, 0, -1)) * dzi, (W(0, 0, 1) - w) * dzi)
    acc_w = (
        nu * (W(-1, 0, 0) - 2 * w + W(1, 0, 0)) * dxi**2
        + nu * (W(0, -1, 0) - 2 * w + W(0, 1, 0)) * dyi**2
        + nu * (W(0, 0, -1) - 2 * w + W(0, 0, 1)) * dzi**2
        - u_here * dwdx - v_here * dwdy - w * dwdz
        + fl.gz
    )
    if csf:
        kap = (kappa + _sh3(kappa, 0, 0, -1)) * 0.5
        fz = -fl.sigma * (F - _sh3(F, 0, 0, -1)) * kap / g.dz
        acc_w = acc_w + fz * 2 / (rho + _sh3(rho, 0, 0, -1))
    ws = w + dt * acc_w
    ws = jnp.where(
        (gi >= 1) & (gi <= g.nx) & j_int & (k >= 2) & (k <= g.nz), ws, 0.0
    )

    # ---- projection rhs (solver3d._solve_pressure_3d) — needs us at i+1,
    # which the masks above make exactly zero at gi = nx+1, matching the
    # XLA path's zeros_like-based u_star
    rhs = rho / dt * (
        (_sh3(us, 1, 0, 0) - us) * dxi
        + (_sh3(vs, 0, 1, 0) - vs) * dyi
        + (_sh3(ws, 0, 0, 1) - ws) * dzi
    )
    rhs = jnp.where((gi >= 1) & (gi <= g.nx) & j_int & k_int, rhs, 0.0)
    return us, vs, ws, rhs


def _predict_kernel(u_hbm, v_hbm, w_hbm, F_hbm, gib,
                    us_hbm, vs_hbm, ws_hbm, rhs_hbm,
                    ub, vb, wb, Fb, usb, vsb, wsb, rhsb, zplane,
                    sems, osems,
                    *, g: Grid3D, fl: Fluid, dt, B: int, nloc: int,
                    njl: int | None = None, csf: bool = False):
    """Double-buffered slab loop. Ext block covers [i0-HW, i0+B+HW) with
    halo width HW = 2 (csf: 3 — kappa's F cone) so the rhs of every
    stored plane sees a valid u*(i+1); first/last chunks use clamped ext
    ranges whose static in-block offsets (1/HW/2HW-1) are selected by
    three predicated staging branches.

    nloc/gib: local plane l has GLOBAL i-index gib[0] + l (serial:
    nloc = g.nx, gib = [0]). All masks are global, so the distributed
    wide-halo caller runs the identical kernel on an extended shard block
    (gib is an SMEM scalar because the shard offset is traced under
    shard_map).

    njl (pencil engine): local interior j-row count of the y-extended
    block; local row m holds GLOBAL j gib[1] + m and the j masks become
    global. None = serial/slab (gib stays a 1-vector, trace unchanged)."""
    gi_base = gib[0]
    gj0 = gib[1] if njl is not None else None
    n0 = nloc + 2
    nc = nloc // B
    HW = 3 if csf else 2
    E = B + 2 * HW

    def ext_start(c):
        return jnp.where(c == 0, 0,
                         jnp.where(c == nc - 1, n0 - E, 1 + c * B - HW))

    ins = ((u_hbm, ub), (v_hbm, vb), (w_hbm, wb), (F_hbm, Fb))
    outs = ((usb, us_hbm), (vsb, vs_hbm), (wsb, ws_hbm), (rhsb, rhs_hbm))

    def in_dma(slot, c, i):
        h, b = ins[i]
        return pltpu.make_async_copy(
            h.at[pl.ds(ext_start(c), E)],
            b.at[pl.ds(slot * E, E)],
            sems.at[slot * 4 + i])

    def out_dma(slot, c, i):
        b, h = outs[i]
        return pltpu.make_async_copy(
            b.at[pl.ds(slot * B, B)],
            h.at[pl.ds(1 + c * B, B)],
            osems.at[slot * 4 + i])

    for i in range(4):
        in_dma(0, 0, i).start()

    def body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            for i in range(4):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

        for i in range(4):
            in_dma(slot, c, i).wait()

        s0 = slot * E
        es = ext_start(c)
        # in-block BC: the state's velocity ghosts are NOT maintained
        # between steps (no per-step XLA BC pass) — reconstruct them here
        u_, v_, w_ = ub[pl.ds(s0, E)], vb[pl.ds(s0, E)], wb[pl.ds(s0, E)]
        gi = _iota3(u_.shape, 0) + es + gi_base
        gj = None if gj0 is None else _iota3(u_.shape, 1) + gj0
        u_, v_, w_ = _bc_fix_uvw(g, u_, v_, w_, gi, gj)
        us, vs, ws, rhs = _predict_block(
            g, fl, dt, u_, v_, w_, Fb[pl.ds(s0, E)], es + gi_base, gj0,
            csf=csf)

        # the staging slot was last used by chunk c-2: drain its output DMA
        @pl.when(c >= 2)
        def _():
            for i in range(4):
                out_dma(slot, c - 2, i).wait()

        def stage(off):
            def f():
                for (b, _h), val in zip(outs, (us, vs, ws, rhs)):
                    b[pl.ds(slot * B, B)] = lax.slice_in_dim(
                        val, off, off + B, axis=0)
            return f

        pl.when(c == 0)(stage(1))
        pl.when((c > 0) & (c < nc - 1))(stage(HW))
        pl.when(c == nc - 1)(stage(2 * HW - 1))

        for i in range(4):
            out_dma(slot, c, i).start()
        return 0

    lax.fori_loop(0, nc, body, 0)

    for c in (nc - 2, nc - 1):
        for i in range(4):
            out_dma(c % 2, c, i).wait()

    # ghost planes of every output are defined-zero (the XLA path's
    # zeros_like base); downstream never reads them but metrics/tests may
    zplane[:] = jnp.zeros_like(zplane)
    gz = []
    for i, h in enumerate((us_hbm, vs_hbm, ws_hbm, rhs_hbm)):
        gz.append(_copy(zplane, h.at[pl.ds(0, 1)], sems.at[i]))
        gz.append(_copy(zplane, h.at[pl.ds(n0 - 1, 1)], osems.at[i]))
    for d in gz:
        d.wait()


def _gib_vec(gi_base, gj_base, pencil: bool):
    """SMEM scalar vector: [gi_base] for the serial/slab kernels (their
    program signature is unchanged), [gi_base, gj_base] for the pencil
    engine (both offsets are traced under shard_map)."""
    if not pencil:
        return jnp.atleast_1d(jnp.asarray(gi_base, jnp.int32))
    return jnp.stack([jnp.asarray(gi_base, jnp.int32),
                      jnp.asarray(gj_base, jnp.int32)])


def pallas_predict3d_rhs(g: Grid3D, fl: Fluid, dt, u, v, w, F,
                         interpret: bool = False,
                         nloc: int | None = None, gi_base: int = 0,
                         njl: int | None = None, gj_base=0,
                         csf: bool = False):
    """Returns (u_star, v_star, w_star, rhs), all full-shape. njl/gj_base:
    pencil engine; csf: fused normals+curvature+sigma terms (see
    _predict_kernel / _predict_block)."""
    if nloc is None:
        nloc = g.nx
    B = _pick_chunk(nloc, _plane_bytes(F.shape))
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    E = B + (6 if csf else 4)
    plane = F.shape[1:]
    blk = lambda n: pltpu.VMEM((n, *plane), F.dtype)  # noqa: E731
    # csf adds the normals/curvature temporaries (~4 E-blocks live)
    vmem_blocks = 64 if csf else 52
    return pl.pallas_call(
        partial(_predict_kernel, g=g, fl=fl, dt=dt, B=B, nloc=nloc, njl=njl,
                csf=csf),
        out_shape=(shape,) * 4,
        in_specs=_any_specs(4)
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM)],
        out_specs=tuple(_any_specs(4)),
        scratch_shapes=[
            blk(2 * E), blk(2 * E), blk(2 * E), blk(2 * E),  # ext in x2 slots
            blk(2 * B), blk(2 * B), blk(2 * B), blk(2 * B),  # out staging x2
            blk(1),                                          # zero plane
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=_vmem_params(
            vmem_blocks * E * plane[0] * plane[1] * 4),
        interpret=interpret,
    )(u, v, w, F, _gib_vec(gi_base, gj_base, njl is not None))


# ----------------------------------------------------------------------
# correct3d: velocity correction (3dvof.py:286-302)
# ----------------------------------------------------------------------


def _correct_kernel(us_hbm, vs_hbm, ws_hbm, p_hbm, F_hbm, gib,
                    u_hbm, v_hbm, w_hbm,
                    usb, vsb, wsb, pb, Fb, ub, vb, wb, zplane,
                    sems, osems,
                    *, g: Grid3D, fl: Fluid, dt, B: int, nloc: int,
                    njl: int | None = None):
    """Double-buffered; all chunks are uniform (p/F carry a one-plane west
    halo, ext [i0-1, i0+B+1) stays in bounds at both ends). nloc/gib/njl:
    see _predict_kernel. In pencil mode the stored u/v/w additionally
    mask the sublane-pad rows to zero — u/v/w PERSIST across steps and
    the pad is never refreshed, so junk there would compound (the
    pad-zero invariant); block-edge rows are sacrificial like the
    i-block edges (refreshed from neighbors every step)."""
    gi_base = gib[0]
    gj0 = gib[1] if njl is not None else None
    n0 = nloc + 2
    nc = nloc // B
    E1 = B + 1

    ins = ((us_hbm, usb, 0, B), (vs_hbm, vsb, 0, B), (ws_hbm, wsb, 0, B),
           (p_hbm, pb, -1, E1), (F_hbm, Fb, -1, E1))
    outs = ((ub, u_hbm), (vb, v_hbm), (wb, w_hbm))

    def in_dma(slot, c, i):
        h, b, d0, n = ins[i]
        return pltpu.make_async_copy(
            h.at[pl.ds(1 + c * B + d0, n)],
            b.at[pl.ds(slot * n, n)],
            sems.at[slot * 5 + i])

    def out_dma(slot, c, i):
        b, h = outs[i]
        return pltpu.make_async_copy(
            b.at[pl.ds(slot * B, B)],
            h.at[pl.ds(1 + c * B, B)],
            osems.at[slot * 3 + i])

    for i in range(5):
        in_dma(0, 0, i).start()

    def body(c, _):
        i0 = 1 + c * B
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            for i in range(5):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

        for i in range(5):
            in_dma(slot, c, i).wait()

        rho, _ = mix_properties(fl, Fb[pl.ds(slot * E1, E1)])
        p = pb[pl.ds(slot * E1, E1)]
        p_c = lax.slice_in_dim(p, 1, B + 1, axis=0)
        p_w = lax.slice_in_dim(p, 0, B, axis=0)
        r_c = lax.slice_in_dim(rho, 1, B + 1, axis=0)
        r_w = lax.slice_in_dim(rho, 0, B, axis=0)

        shape = p_c.shape
        gi = _iota3(shape, 0) + i0 + gi_base
        j = _iota3(shape, 1)
        k = _iota3(shape, 2)
        if gj0 is None:
            gj = j
            j_int = (j >= 1) & (j <= g.ny)
        else:
            gj = j + gj0
            j_int = (gj >= 1) & (gj <= g.ny) & (j <= njl + 1)
        k_int = (k >= 1) & (k <= g.nz)
        i_int = (gi >= 1) & (gi <= g.nx)

        sB = slot * B
        u = usb[pl.ds(sB, B)] - dt / ((r_c + r_w) * 0.5) * (p_c - p_w) * g.dxi
        v = vsb[pl.ds(sB, B)] - dt / ((r_c + _sh3(r_c, 0, -1, 0)) * 0.5) * (
            p_c - _sh3(p_c, 0, -1, 0)) * g.dyi
        w = wsb[pl.ds(sB, B)] - dt / ((r_c + _sh3(r_c, 0, 0, -1)) * 0.5) * (
            p_c - _sh3(p_c, 0, 0, -1)) * g.dzi

        @pl.when(c >= 2)
        def _():
            for i in range(3):
                out_dma(slot, c - 2, i).wait()

        if gj0 is None:
            v_mask = i_int & (j >= 2) & (j <= g.ny) & k_int
        else:
            v_mask = i_int & (gj >= 2) & (gj <= g.ny) & (j <= njl + 1) \
                & k_int
        ub[pl.ds(sB, B)] = jnp.where(
            (gi >= 2) & (gi <= g.nx) & j_int & k_int, u, 0.0)
        vb[pl.ds(sB, B)] = jnp.where(v_mask, v, 0.0)
        wb[pl.ds(sB, B)] = jnp.where(
            i_int & j_int & (k >= 2) & (k <= g.nz), w, 0.0)

        for i in range(3):
            out_dma(slot, c, i).start()
        return 0

    lax.fori_loop(0, nc, body, 0)

    for c in (nc - 2, nc - 1):
        for i in range(3):
            out_dma(c % 2, c, i).wait()

    zplane[:] = jnp.zeros_like(zplane)
    gz = []
    for i, h in enumerate((u_hbm, v_hbm, w_hbm)):
        gz.append(_copy(zplane, h.at[pl.ds(0, 1)], sems.at[i]))
        gz.append(_copy(zplane, h.at[pl.ds(n0 - 1, 1)], osems.at[i]))
    for d in gz:
        d.wait()


def pallas_correct3d(g: Grid3D, fl: Fluid, dt, u_star, v_star, w_star, p, F,
                     interpret: bool = False,
                     nloc: int | None = None, gi_base: int = 0,
                     njl: int | None = None, gj_base=0):
    """Returns (u, v, w): zero outside the update regions — wall faces and
    ghosts are reconstructed by the consumers (predict's in-block BC) or
    the simulate-exit BC. njl/gj_base: pencil engine (see _predict_kernel)."""
    if nloc is None:
        nloc = g.nx
    B = _pick_chunk(nloc, _plane_bytes(F.shape))
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    plane = F.shape[1:]
    blk = lambda n: pltpu.VMEM((n, *plane), F.dtype)  # noqa: E731
    return pl.pallas_call(
        partial(_correct_kernel, g=g, fl=fl, dt=dt, B=B, nloc=nloc, njl=njl),
        out_shape=(shape,) * 3,
        in_specs=_any_specs(5)
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM)],
        out_specs=tuple(_any_specs(3)),
        scratch_shapes=[
            blk(2 * B), blk(2 * B), blk(2 * B),
            blk(2 * (B + 1)), blk(2 * (B + 1)),
            blk(2 * B), blk(2 * B), blk(2 * B), blk(1),
            pltpu.SemaphoreType.DMA((10,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=_vmem_params(44 * (B + 1) * plane[0] * plane[1] * 4),
        interpret=interpret,
    )(u_star, v_star, w_star, p, F,
      _gib_vec(gi_base, gj_base, njl is not None))


# ----------------------------------------------------------------------
# FCT sweeps (3dvof.py:366-541) — mirrors ops/fct3d._sweep3d_axis0
# ----------------------------------------------------------------------


def _ghost_planes_out(nloc, F_hbm, out_hbm, gplane, sems, osems, mirror_out):
    """i-ghost planes of a sweep's output. Pass-through sweeps carry the
    input F's (stale-mirror) ghost planes, exactly like the XLA path's
    interior-only .set; the step's LAST sweep instead writes fresh mirrors
    of its own output planes 1/nloc (the final-BC x-face rule; in the
    distributed wide-halo case these planes are sacrificial and the
    caller's masked plane fix handles the true walls)."""
    n0 = nloc + 2
    if mirror_out:
        src_lo = out_hbm.at[pl.ds(1, 1)]
        src_hi = out_hbm.at[pl.ds(nloc, 1)]
    else:
        src_lo = F_hbm.at[pl.ds(0, 1)]
        src_hi = F_hbm.at[pl.ds(n0 - 1, 1)]
    d1 = _copy(src_lo, gplane, sems.at[0])
    d1.wait()
    d2 = _copy(gplane, out_hbm.at[pl.ds(0, 1)], osems.at[0])
    d2.wait()
    d1 = _copy(src_hi, gplane, sems.at[0])
    d1.wait()
    d2 = _copy(gplane, out_hbm.at[pl.ds(n0 - 1, 1)], osems.at[0])
    d2.wait()


def _fct_x_kernel(F_hbm, u_hbm, gib, out_hbm, Fb, ubuf, ob, gplane,
                  sems, osems,
                  *, g: Grid3D, dt, B: int, mirror_out: bool, nloc: int,
                  njl: int | None = None):
    """x-sweep: shifts run along the slab axis, so chunks carry a 3-plane
    halo (ext block E = B+6). First/last chunks clamp the ext range; their
    static in-block offsets (1/3/5) are selected by predicated staging
    branches. Double-buffered.

    A fused variant (in-plane sweeps chained onto the staged center rows,
    5 HBM round trips per 3-step cycle instead of 9) measured ~5% SLOWER
    at 128^3/200^3 on the v5e — the round trips it saves are already
    hidden behind compute by the double buffering — so the sweeps stay
    three separate kernels (git history has the fused implementation).

    njl: pencil engine (see _predict_kernel) — the sweep runs the
    two-axis-masked limiter body with the sublane-pad rows held at the
    input F (zero, the pad invariant)."""
    gi_base = gib[0]
    gj0 = gib[1] if njl is not None else None
    n0 = nloc + 2
    nc = nloc // B
    E = B + 6

    def ext_start(c):
        return jnp.where(c == 0, 0,
                         jnp.where(c == nc - 1, n0 - E, 1 + c * B - 3))

    def in_dma(slot, c, i):
        h, b = ((F_hbm, Fb), (u_hbm, ubuf))[i]
        return pltpu.make_async_copy(
            h.at[pl.ds(ext_start(c), E)],
            b.at[pl.ds(slot * E, E)],
            sems.at[slot * 2 + i])

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            ob.at[pl.ds(slot * B, B)],
            out_hbm.at[pl.ds(1 + c * B, B)],
            osems.at[slot])

    for i in range(2):
        in_dma(0, 0, i).start()

    def body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            for i in range(2):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

        for i in range(2):
            in_dma(slot, c, i).wait()

        F = Fb[pl.ds(slot * E, E)]
        vel = ubuf[pl.ds(slot * E, E)]
        if njl is None:
            f_new = sweep_x_masked(g, dt, F, vel, ext_start(c) + gi_base)
        else:
            f_new = sweep_masked_2axis(g, dt, F, vel, 0,
                                       ext_start(c) + gi_base, gj0,
                                       nj_valid=njl + 1)
        if mirror_out:
            # last sweep of the step: write fresh j/k ghost mirrors of the
            # swept F (stands in for the step's final BC on F; the sweeps
            # of the NEXT step will read exactly these)
            gj = None if gj0 is None else _iota3(f_new.shape, 1) + gj0
            f_new = _mirror_jk(g, f_new, gj, njl)

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        def stage(off):
            def f():
                ob[pl.ds(slot * B, B)] = lax.slice_in_dim(
                    f_new, off, off + B, axis=0)
            return f

        pl.when(c == 0)(stage(1))
        pl.when((c > 0) & (c < nc - 1))(stage(3))
        pl.when(c == nc - 1)(stage(5))

        out_dma(slot, c).start()
        return 0

    lax.fori_loop(0, nc, body, 0)

    for c in (nc - 2, nc - 1):
        out_dma(c % 2, c).wait()

    _ghost_planes_out(nloc, F_hbm, out_hbm, gplane, sems, osems,
                      mirror_out)


def _fct_yz_kernel(F_hbm, vel_hbm, *rest, g: Grid3D, axis: int, dt, B: int,
                   mirror_out: bool, nloc: int, njl: int | None = None):
    """y- or z-sweep: shifts are in-plane (sublane/lane rolls), so chunks
    need no i-halo at all. Double-buffered.

    njl (pencil engine): the serial kernel takes no scalar input (the
    in-plane limiter needs no i-position); pencil mode adds the
    [gi_base, gj_base] SMEM vector — the two-axis-masked limiter body
    needs BOTH global offsets."""
    if njl is None:
        gib = None
        out_hbm, Fb, vbuf, ob, gplane, sems, osems = rest
    else:
        gib, out_hbm, Fb, vbuf, ob, gplane, sems, osems = rest
    n0 = nloc + 2
    nc = nloc // B

    def in_dma(slot, c, i):
        h, b = ((F_hbm, Fb), (vel_hbm, vbuf))[i]
        return pltpu.make_async_copy(
            h.at[pl.ds(1 + c * B, B)],
            b.at[pl.ds(slot * B, B)],
            sems.at[slot * 2 + i])

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            ob.at[pl.ds(slot * B, B)],
            out_hbm.at[pl.ds(1 + c * B, B)],
            osems.at[slot])

    for i in range(2):
        in_dma(0, 0, i).start()

    def body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            for i in range(2):
                in_dma(lax.rem(c + 1, 2), c + 1, i).start()

        for i in range(2):
            in_dma(slot, c, i).wait()

        if njl is None:
            f_new = sweep_inplane_masked(g, dt, Fb[pl.ds(slot * B, B)],
                                         vbuf[pl.ds(slot * B, B)], axis)
            f_new = _mirror_jk(g, f_new) if mirror_out else f_new
        else:
            f_new = sweep_masked_2axis(g, dt, Fb[pl.ds(slot * B, B)],
                                       vbuf[pl.ds(slot * B, B)], axis,
                                       1 + c * B + gib[0], gib[1],
                                       nj_valid=njl + 1)
            if mirror_out:
                gj = _iota3(f_new.shape, 1) + gib[1]
                f_new = _mirror_jk(g, f_new, gj, njl)

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        ob[pl.ds(slot * B, B)] = f_new
        out_dma(slot, c).start()
        return 0

    lax.fori_loop(0, nc, body, 0)

    for c in (nc - 2, nc - 1):
        out_dma(c % 2, c).wait()

    _ghost_planes_out(nloc, F_hbm, out_hbm, gplane, sems, osems,
                      mirror_out)


def pallas_fct3d_sweep(g: Grid3D, dt, F, vel, axis: int,
                       interpret: bool = False, mirror_out: bool = False,
                       nloc: int | None = None, gi_base: int = 0,
                       njl: int | None = None, gj_base=0):
    """One Rudman FCT sweep along `axis` (0=x, 1=y, 2=z) with the
    reference's literal (non-uniform) scale factors — see ops/fct3d.py.
    mirror_out=True (the step's last sweep) writes fresh ghost mirrors of
    the swept F — the step's final BC on F — instead of passing the input
    ghosts through. nloc/gi_base: see _predict_kernel; njl/gj_base:
    pencil engine."""
    if nloc is None:
        nloc = g.nx
    B = _pick_chunk(nloc, _plane_bytes(F.shape))
    shape = jax.ShapeDtypeStruct(F.shape, F.dtype)
    plane = F.shape[1:]
    blk = lambda n: pltpu.VMEM((n, *plane), F.dtype)  # noqa: E731
    if axis == 0:
        E = B + 6
        return pl.pallas_call(
            partial(_fct_x_kernel, g=g, dt=dt, B=B, mirror_out=mirror_out,
                    nloc=nloc, njl=njl),
            out_shape=shape,
            in_specs=_any_specs(2)
            + [pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[
                blk(2 * E), blk(2 * E), blk(2 * B), blk(1),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_vmem_params(38 * E * plane[0] * plane[1] * 4),
            interpret=interpret,
        )(F, vel, _gib_vec(gi_base, gj_base, njl is not None))
    in_specs = _any_specs(2)
    operands = [F, vel]
    if njl is not None:
        in_specs = in_specs + [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM)]
        operands.append(_gib_vec(gi_base, gj_base, True))
    return pl.pallas_call(
        partial(_fct_yz_kernel, g=g, axis=axis, dt=dt, B=B,
                mirror_out=mirror_out, nloc=nloc, njl=njl),
        out_shape=shape,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            blk(2 * B), blk(2 * B), blk(2 * B), blk(1),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_vmem_params(38 * B * plane[0] * plane[1] * 4),
        interpret=interpret,
    )(*operands)
