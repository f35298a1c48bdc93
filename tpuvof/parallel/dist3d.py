"""Distributed 3-D solver: `shard_map` x-axis (or x,y-pencil) decomposition.

The 3-D counterpart of parallel/dist.py (VERDICT r1 #7). The volume is
sliced along axis 0 (x) — the axis the Pallas slab kernels already
stream along, so lanes (z) and sublanes (y) stay intact per shard and every
y/z FCT sweep is communication-free — or, for the XLA engine on a 2-axis
mesh, into (x, y) pencils (z is never decomposed: it is the lane axis,
and cutting it would shard every row the hardware vectorizes over). Each
shard holds its interior block padded with the usual one-ghost-plane
ring; interior-boundary ghosts ride ICI via `lax.ppermute`, physical
walls use masked BC formulas on edge shards.

Communication per step (all nearest-neighbor along one mesh axis):
  predict: u*, v*, w* ghosts      pressure: p per Jacobi iteration
  BCs (x3): u, v, w, F, p         FCT x-sweep: a 3-plane wide F/u halo
  (the y/z sweeps touch only in-plane neighbors: zero comm)

The x-sweep uses the wide-halo trick instead of per-pass intermediate
syncs: ship 3 planes of current neighbor data, run the whole 4-pass sweep
on the extended block with global-index masks
(ops/fct3d.fct3d_sweep_x_windowed), keep the fully-haloed central planes.
Same trajectory as the serial sweep at f64 1e-12 (tests/test_parallel_3d.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Fluid
from ..grid import Grid3D
from ..state import State3D
from ..ops import clamp01, mix_properties
from ..ops.fct3d import (fct3d_sweep_x_windowed, fct3d_sweep_y,
                         fct3d_sweep_z, sweep_masked_2axis)
from ..ops.momentum3d import predict_velocity_3d, update_velocity_3d

from ..solver3d import _SWEEP_ORDER as _SWEEP_ORDER3

__all__ = ["Decomp3D"]


from dataclasses import dataclass


@dataclass(frozen=True)
class _LocalGrid3:
    nx: int
    ny: int
    nz: int
    dx: float
    dy: float
    dz: float
    dxi: float
    dyi: float
    dzi: float


def _shift_x(sl, axis_name: str, n: int, up: bool):
    perm = [(i, i + 1) for i in range(n - 1)] if up else \
        [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(sl, axis_name, perm)


def _pad_planes(nyE: int, nz: int) -> tuple[int, int]:
    """Sublane/lane pad of a (nyE+2, nz+2) local plane (cf.
    solver3d._pad_jk for the global-plane case)."""
    return (-(nyE + 2)) % 8, (-(nz + 2)) % 128


def pallas_admission_3d(g: Grid3D, px: int, py: int, n_jacobi: int = 10,
                        halo_width: int | None = None,
                        pencil: bool | None = None,
                        csf: bool = False) -> dict:
    """Pure admission + geometry of the 3-D pallas engines for a px x py
    decomposition — the single source Decomp3D.__init__ and the mesh
    planner (parallel/plan.py) consult. Requires nx % px == ny % py == 0
    (callers check divisibility first). Returns a dict:

      ok       — whether backend='pallas' is admitted at this shape
      pencil   — which engine the shape implies (py > 1, or forced)
      W, nloc  — x cone + extended interior plane count (chunk-rounded)
      Wy, nyE  — y cone + extended interior row count (0 / nyl if slab)
      B        — admitted Jacobi chunk thickness (None if not ok)
      plane    — padded local plane dims the chunked Jacobi would run
      why      — human-readable reason when not ok
    """
    from ..pallas_kernels.jacobi3d import _pick_chunk as _jpick
    from ..pallas_kernels.step3d import _pick_chunk as _spick

    nxl, nyl = g.nx // px, g.ny // py
    use_pencil = (py > 1) if pencil is None else bool(pencil)
    # csf widens the predictor's F dependency cone from +-1 to +-3 planes
    # (kappa at i±1 needs normals at i±2 needs F at i±3), so every
    # downstream erosion shifts by 2: the minimal cone grows from
    # n_jacobi+4 to n_jacobi+6 (same argument in y for the pencil block)
    base = n_jacobi + (6 if csf else 4)
    W = halo_width if halo_width is not None else base
    # nxl + 2W must be a slab-chunk multiple (B in {8,4,2} with >= 3
    # chunks; B=8 preferred — fewer, larger DMAs won the A/B at 200^3,
    # BASELINE.md). 2W only shifts the residue by even amounts, so odd
    # nxl can never satisfy it (checked first: the rounding loop would
    # not terminate).
    ok = nxl % 2 == 0
    if ok:
        def round_W(W, mod):
            while (nxl + 2 * W) % mod or _spick(nxl + 2 * W) is None:
                W += 1
            return W

        W8 = round_W(W, 8)
        W = W8 if W8 + 1 <= nxl else round_W(W, 4)
    nloc = nxl + 2 * W
    # each (W+1)-plane halo must come from ONE neighbor's owned planes
    ok = ok and W + 1 <= nxl
    # pencil: minimal y cone (the y stencils mirror the x ones: rhs
    # invalid at the outermost row, n_jacobi erosions, p at j-1, 3-row
    # FCT y-sweep), no chunk rounding (chunks are x-only; planes are
    # sublane-padded regardless)
    Wy = base if use_pencil else 0
    nyE = nyl + 2 * Wy
    if use_pencil:
        ok = ok and Wy + 1 <= nyl
    pj, pk = _pad_planes(nyE, g.nz)
    plane = (nyE + 2 + pj, g.nz + 2 + pk)
    B = None
    if ok:
        B = _jpick(nloc, g, nloc, plane=plane if use_pencil else None)
        ok = B is not None
    why = ""
    if not ok:
        why = (f"needs even nx/px > W={W} (nx/px={nxl})"
               + (f", ny/py > Wy={Wy} (ny/py={nyl})" if use_pencil else "")
               + " and the extended pressure volume VMEM-resident")
    return dict(ok=ok, pencil=use_pencil, W=W, nloc=nloc, Wy=Wy, nyE=nyE,
                B=B, plane=plane, why=why)


class Decomp3D:
    """Domain decomposition of a 3-D grid: x slabs over a 1-axis mesh, or
    (x, y) pencils over a 2-axis mesh. Both have an XLA engine (the
    pencil sweeps use ops/fct3d.sweep_masked_2axis with global-index
    masks on both decomposed axes) and a resident wide-halo pallas
    engine: on a 2-axis mesh the slab kernels run in PENCIL mode — every
    j mask goes global through a second traced offset (gj_base) exactly
    like the i masks did for slabs, the resident block is W-extended in
    x AND Wy-extended in y (Wy = n_jacobi + 4, the same minimal cone —
    no chunk rounding, chunks are x-only), and the per-step refresh runs
    an x stage then a y stage over the refreshed x halos so corner halos
    arrive without diagonal communication.

    backend='pallas' runs the whole per-shard step on the slab-tiled
    kernels (pallas_kernels/step3d.py, jacobi3d.py) on a RESIDENT
    wide-halo block (round-3 redesign; the round-2 engine re-widened and
    re-sliced every step, two full state copies/step — git history):

    - the scan carries the W-extended local block (nloc = nxl + 2W planes
      + 2 block ghosts); widen once at entry, slice once at exit.
    - each step starts with one in-place halo refresh: the (W+1) outer
      planes per side are overwritten with the neighbor's owned planes
      via `ppermute` + static-slice `.at[].set` (XLA updates in place —
      no concatenate materialization). Edge shards keep their beyond-wall
      planes, whose junk is inert under the kernels' global-index masks.
    - W is the MINIMAL step dependency cone, n_jacobi + 4 (rhs is invalid
      at the outermost computed plane; n_jacobi Jacobi passes erode one
      plane/side each; correct reads p at i-1; the FCT x-sweep reads 3
      planes), rounded up so nloc is a slab-chunk multiple — vs the
      round-2 engine's conservative n_jacobi + 12. The validity induction:
      post-refresh every block plane holds current global data, so final
      F is serial-valid on [5+n_jacobi, nloc-n_jacobi-3] ⊇ the owned
      planes iff W >= n_jacobi+4; u/v/w/p need less; the next refresh
      re-validates the halo from the neighbors' owned planes.
    - the serial kernels are the gi_base=0 special case of the same
      global masks; at px=1 the refresh is a no-op and the trajectory is
      BIT-identical to the serial pallas path (tests_tpu).

    Requires even nx/px >= W+1 (each halo comes from ONE neighbor) and
    the extended pressure volume VMEM-resident; falls back to the XLA
    engine with a warning otherwise."""

    def __init__(self, g: Grid3D, mesh: Mesh, fl: Fluid | None = None,
                 dt: float = 4e-6, n_jacobi: int = 10,
                 backend: str = "xla", halo_width: int | None = None,
                 pencil: bool = False, pressure_solver: str = "jacobi",
                 sor_omega: float = 1.7, sor_tol: float = 1e-3,
                 sor_max_iter: int = 200, csf: bool = False,
                 sor_tol_rel: float = 0.0):
        axes = tuple(mesh.axis_names)
        if len(axes) not in (1, 2):
            raise ValueError(
                "Decomp3D expects a 1-axis (x slabs) or 2-axis (x,y "
                "pencils) mesh")
        self.g = g
        self.mesh = mesh
        self.ax = axes[0]
        self.ay = axes[1] if len(axes) == 2 else None
        self.px = mesh.shape[self.ax]
        self.py = mesh.shape[self.ay] if self.ay is not None else 1
        if g.nx % self.px or g.ny % self.py:
            raise ValueError(
                f"grid {g.nx}x{g.ny} not divisible by mesh "
                f"{self.px}x{self.py}")
        self.nxl = g.nx // self.px
        self.nyl = g.ny // self.py
        self.fl = fl or Fluid()
        self.dt = dt
        self.n_jacobi = n_jacobi
        if pressure_solver == "auto":
            # distributed 'auto' -> mg where the global grid coarsens
            # (the measured production upgrade; its coarse levels ride ONE
            # all_gather instead of per-sweep exchanges — parallel/mg.py),
            # rbsor on non-coarsenable grids
            from ..ops.mg import mg_levels

            pressure_solver = (
                "mg" if len(mg_levels((g.nx, g.ny, g.nz))) >= 2
                else "rbsor")
        if pressure_solver not in ("jacobi", "rbsor", "mg"):
            raise ValueError(
                f"unknown pressure_solver {pressure_solver!r} "
                "(jacobi | rbsor | mg | auto)")
        self.pressure_solver = pressure_solver
        self.sor_omega = sor_omega
        self.sor_tol = sor_tol
        self.sor_max_iter = sor_max_iter
        self.sor_tol_rel = sor_tol_rel
        # 3-D surface tension (the upgrade the reference leaves disabled,
        # 3dvof.py:304-332,607): XLA engine computes local normals +
        # curvature with 4 extra ghost exchanges per step; pallas engine
        # fuses them into the slab predict kernel (csf=True widens the
        # admission cone W/Wy by 2 — see pallas_admission_3d)
        self.csf = bool(csf)
        # residual-driven solvers + backend='pallas' run the HYBRID step
        # (VERDICT r4 #1): the slab predict/correct/FCT kernels on a
        # resident block whose cone is sized WITHOUT the Jacobi erosion
        # (the hosted distributed solve re-validates p globally), with
        # the rbsor/parallel-mg solve as XLA between the kernel phases —
        # the sharded counterpart of solver3d._step_3d_pallas_padded's
        # rbsor/mg branch.
        self.hybrid = backend == "pallas" and pressure_solver != "jacobi"
        self.backend = backend
        # pencil mode: the slab kernels with GLOBAL j masks on a
        # y-extended resident block (required for py > 1 with pallas;
        # pencil=True forces it on a py == 1 two-axis mesh, where the
        # refresh is a no-op — the bit-exactness pin of tests_tpu)
        if pencil and self.ay is None:
            raise ValueError("pencil=True needs a 2-axis mesh")
        if pencil and backend != "pallas":
            raise ValueError("pencil=True forces the pallas pencil engine"
                             f"; backend={backend!r} cannot honor it")
        self.pencil = backend == "pallas" and self.ay is not None \
            and (self.py > 1 or bool(pencil))
        self.Wy = 0
        self.nyE = self.nyl
        if backend == "pallas":
            # the hybrid's cone is sized WITHOUT the Jacobi erosion: the
            # hosted distributed solve re-validates p globally between
            # the predict and correct kernel phases
            adm = pallas_admission_3d(
                g, self.px, self.py, 0 if self.hybrid else n_jacobi,
                halo_width, pencil=self.pencil, csf=self.csf)
            self.W, self.nloc = adm["W"], adm["nloc"]
            self.Wy, self.nyE = adm["Wy"], adm["nyE"]
            if not adm["ok"]:
                import warnings

                warnings.warn(f"Decomp3D backend='pallas' {adm['why']}; "
                              "using the XLA engine. (parallel.plan_mesh_3d"
                              " / `tpuvof --plan-mesh N --three-d` ranks "
                              "the admissible mesh shapes)")
                self.backend = "xla"
                self.hybrid = False
                self.pencil = False
                self.Wy = 0
                self.nyE = self.nyl
        self._run = None

    def _pencil_pad(self):
        """Sublane/lane pad of the pencil block's LOCAL planes — the one
        formula the admission check (pallas_admission_3d) and the runtime
        pad in make_simulate use (if they diverged, the constructor would
        validate one plane shape and the kernels would run another,
        surfacing only as a remote Mosaic compile failure)."""
        return _pad_planes(self.nyE, self.g.nz)

    # ---- shard coordinates (traced inside shard_map) ----
    def _xi(self):
        return lax.axis_index(self.ax) if self.px > 1 else 0

    def _yi(self):
        return lax.axis_index(self.ay) if self.py > 1 else 0

    def _is_left(self):
        return self._xi() == 0

    def _is_right(self):
        return self._xi() == self.px - 1

    def _is_bottom(self):
        return self._yi() == 0

    def _is_top(self):
        return self._yi() == self.py - 1

    def _exchange(self, a):
        """Refresh the axis-0 (x) and axis-1 (y) ghost layers from
        neighbors; edge shards keep their existing (wall/stale) ghosts.
        x-stage first, then y-stage over full x extent (incl. the just-
        refreshed x ghosts), so corner/edge ghosts land correctly without
        diagonal communication (cf. parallel/halo.exchange)."""
        if self.px > 1:
            recv_lo = _shift_x(a[-2], self.ax, self.px, up=True)
            recv_hi = _shift_x(a[1], self.ax, self.px, up=False)
            a = a.at[0].set(jnp.where(self._is_left(), a[0], recv_lo))
            a = a.at[-1].set(jnp.where(self._is_right(), a[-1], recv_hi))
        if self.py > 1:
            recv_lo = _shift_x(a[:, -2], self.ay, self.py, up=True)
            recv_hi = _shift_x(a[:, 1], self.ay, self.py, up=False)
            a = a.at[:, 0].set(
                jnp.where(self._is_bottom(), a[:, 0], recv_lo))
            a = a.at[:, -1].set(
                jnp.where(self._is_top(), a[:, -1], recv_hi))
        return a

    def _widen(self, a, w: int = 2):
        """Extend a local (nxl+2, ...) block with w extra *current* neighbor
        planes on each side (beyond the ghost plane); edge shards get zeros
        there — the windowed sweep's global masks keep them inert."""
        if self.px == 1:
            z = jnp.zeros((w,) + a.shape[1:], a.dtype)
            return jnp.concatenate([z, a, z], axis=0)
        lo = _shift_x(a[-2 - w:-2], self.ax, self.px, up=True)
        hi = _shift_x(a[2:2 + w], self.ax, self.px, up=False)
        zero = jnp.zeros_like(lo)
        lo = jnp.where(self._is_left(), zero, lo)
        hi = jnp.where(self._is_right(), zero, hi)
        return jnp.concatenate([lo, a, hi], axis=0)

    def _widen_y(self, a, w: int = 2):
        """The axis-1 (y) twin of _widen, for the windowed y-sweep of the
        2-axis decomposition."""
        if self.py == 1:
            z = jnp.zeros(a.shape[:1] + (w,) + a.shape[2:], a.dtype)
            return jnp.concatenate([z, a, z], axis=1)
        lo = _shift_x(a[:, -2 - w:-2], self.ay, self.py, up=True)
        hi = _shift_x(a[:, 2:2 + w], self.ay, self.py, up=False)
        zero = jnp.zeros_like(lo)
        lo = jnp.where(self._is_bottom(), zero, lo)
        hi = jnp.where(self._is_top(), zero, hi)
        return jnp.concatenate([lo, a, hi], axis=1)

    # ---- masked BCs (reference order: y, x, z faces; ops/bc.py) ----
    def _bc(self, u, v, w, F, p):
        left, right = self._is_left(), self._is_right()
        bot, top = self._is_bottom(), self._is_top()

        def m(arr, idx, val):
            return arr.at[idx].set(val)

        # y faces: the serial formulas masked to the y-edge shards (when
        # py == 1 every shard is both edges and the masks fold away)
        u = u.at[:, 0].set(jnp.where(bot, u[:, 1], u[:, 0]))
        u = u.at[:, -1].set(jnp.where(top, u[:, -2], u[:, -1]))
        v = v.at[:, 1].set(jnp.where(bot, 0.0, v[:, 1]))
        v = v.at[:, -1].set(jnp.where(top, 0.0, v[:, -1]))
        w = w.at[:, 0].set(jnp.where(bot, w[:, 1], w[:, 0]))
        w = w.at[:, -1].set(jnp.where(top, w[:, -2], w[:, -1]))
        F = F.at[:, 0].set(jnp.where(bot, F[:, 1], F[:, 0]))
        F = F.at[:, -1].set(jnp.where(top, F[:, -2], F[:, -1]))
        p = p.at[:, 0].set(jnp.where(bot, p[:, 1], p[:, 0]))
        p = p.at[:, -1].set(jnp.where(top, p[:, -2], p[:, -1]))

        u = u.at[1].set(jnp.where(left, 0.0, u[1]))
        u = u.at[-1].set(jnp.where(right, 0.0, u[-1]))
        v = v.at[0].set(jnp.where(left, v[1], v[0]))
        v = v.at[-1].set(jnp.where(right, v[-2], v[-1]))
        w = w.at[0].set(jnp.where(left, w[1], w[0]))
        w = w.at[-1].set(jnp.where(right, w[-2], w[-1]))
        F = F.at[0].set(jnp.where(left, F[1], F[0]))
        F = F.at[-1].set(jnp.where(right, F[-2], F[-1]))
        p = p.at[0].set(jnp.where(left, p[1], p[0]))
        p = p.at[-1].set(jnp.where(right, p[-2], p[-1]))

        u = m(u, (slice(None), slice(None), 0), u[:, :, 1])
        u = m(u, (slice(None), slice(None), -1), u[:, :, -2])
        v = m(v, (slice(None), slice(None), 0), v[:, :, 1])
        v = m(v, (slice(None), slice(None), -1), v[:, :, -2])
        w = m(w, (slice(None), slice(None), 1), 0.0)
        w = m(w, (slice(None), slice(None), -1), 0.0)
        F = m(F, (slice(None), slice(None), 0), F[:, :, 1])
        F = m(F, (slice(None), slice(None), -1), F[:, :, -2])
        p = m(p, (slice(None), slice(None), 0), p[:, :, 1])
        p = m(p, (slice(None), slice(None), -1), p[:, :, -2])

        ex = self._exchange
        return ex(u), ex(v), ex(w), ex(F), ex(p)

    # ---- distributed pressure solve ----
    def _gsum(self, x):
        s = lax.psum(jnp.sum(x), self.ax)
        if self.ay is not None:
            s = lax.psum(s, self.ay)
        return s

    def _gmax(self, x):
        m = lax.pmax(jnp.max(x), self.ax)
        if self.ay is not None:
            m = lax.pmax(m, self.ay)
        return m

    def _poisson_local(self, p, us, vs, ws, rho):
        """Per-shard rhs + 7-point coefficients (Neumann edges zeroed at
        the GLOBAL walls via the shard-position masks)."""
        g = self.g
        I = (slice(1, -1),) * 3
        rhs = rho[I] / self.dt * (
            (us[2:, 1:-1, 1:-1] - us[I]) * g.dxi
            + (vs[1:-1, 2:, 1:-1] - vs[I]) * g.dyi
            + (ws[1:-1, 1:-1, 2:] - ws[I]) * g.dzi
        )
        return rhs, self._poisson_coeffs(p.dtype)

    def _poisson_coeffs(self, dtype):
        """The 7-point coefficients alone — the hybrid step reuses them
        against the rhs the slab predict kernel already computed."""
        g = self.g
        shape = (self.nxl, self.nyl, g.nz)
        dxi2 = jnp.asarray(np.float64(g.dxi) ** 2, dtype)
        dyi2 = jnp.asarray(np.float64(g.dyi) ** 2, dtype)
        dzi2 = jnp.asarray(np.float64(g.dzi) ** 2, dtype)
        li = lax.broadcasted_iota(jnp.int32, shape, 0)
        lj = lax.broadcasted_iota(jnp.int32, shape, 1)
        lk = lax.broadcasted_iota(jnp.int32, shape, 2)
        zero = jnp.zeros((), dtype)
        ae = jnp.where(self._is_right() & (li == self.nxl - 1), zero, dxi2)
        aw = jnp.where(self._is_left() & (li == 0), zero, dxi2)
        an = jnp.where(self._is_top() & (lj == self.nyl - 1), zero, dyi2)
        a_s = jnp.where(self._is_bottom() & (lj == 0), zero, dyi2)
        af = jnp.where(lk == g.nz - 1, zero, dzi2)
        ab = jnp.where(lk == 0, zero, dzi2)
        ap_inv = -1.0 / (ae + aw + an + a_s + ab + af)
        return (ae, aw, an, a_s, af, ab, ap_inv)

    @staticmethod
    def _neigh(p, rhs, coeffs):
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

    def _solve_upgraded(self, p, rhs):
        """Dispatch the residual-driven solvers (rbsor / parallel-mg) on
        ring-layout (p, rhs) — shared by the XLA step (which computes rhs
        via _poisson_local) and the HYBRID step (which slices the rhs the
        slab predict kernel already fused)."""
        if self.pressure_solver == "rbsor":
            return self._solve_pressure_rbsor(
                p, rhs, self._poisson_coeffs(p.dtype))
        from .mg import MGDecomp, mg_solve_dist

        g = self.g
        spec = MGDecomp(
            axis_names=(self.ax if self.px > 1 else None,
                        self.ay if self.py > 1 else None, None),
            shards=(self.px, self.py, 1))
        return mg_solve_dist(spec, p, rhs,
                             (g.dxi**2, g.dyi**2, g.dzi**2),
                             self.sor_tol, self.sor_max_iter,
                             tol_rel=self.sor_tol_rel)

    def _solve_pressure(self, p, us, vs, ws, rho):
        rhs, coeffs = self._poisson_local(p, us, vs, ws, rho)
        if self.pressure_solver in ("rbsor", "mg"):
            return self._solve_upgraded(p, rhs)
        I = (slice(1, -1),) * 3
        ap_inv = coeffs[-1]

        def body(_, p):
            p_int = self._neigh(p, rhs, coeffs) * ap_inv
            return self._exchange(p.at[I].set(p_int))

        return lax.fori_loop(0, self.n_jacobi, body, p, unroll=True)

    def _solve_pressure_rbsor(self, p, rhs, coeffs):
        """Distributed 3-D red-black SOR with the on-device residual stop
        — the 3-D twin of parallel/dist.py::_solve_pressure_rbsor: one
        halo exchange per half-sweep, the rhs nullspace projection as a
        psum-mean, the stopping residual as psum-mean + pmax so every
        shard takes the identical trip count, and red/black parity at
        GLOBAL (i+j+k) indices so the sweep updates the same cells as
        the serial solver3d._rbsor_3d (pinned at 1e-12 f64 by
        tests/test_parallel_3d.py)."""
        g = self.g
        npts = g.nx * g.ny * g.nz
        rhs = rhs - self._gsum(rhs) / npts
        # relative stopping tolerance: GLOBAL max|rhs'| scale (pmax), so
        # the effective tol matches serial and every shard's trip count
        # (cf. parallel/dist.py and ops.poisson.effective_tol)
        tol = self.sor_tol
        if self.sor_tol_rel and self.sor_tol_rel > 0.0:
            tol = jnp.maximum(tol,
                              self.sor_tol_rel * self._gmax(jnp.abs(rhs)))
        ap_inv = coeffs[-1]
        ap = 1.0 / ap_inv
        I = (slice(1, -1),) * 3
        shape = (self.nxl, self.nyl, g.nz)
        gi = lax.broadcasted_iota(jnp.int32, shape, 0) \
            + self._xi() * self.nxl
        gj = lax.broadcasted_iota(jnp.int32, shape, 1) \
            + self._yi() * self.nyl
        gk = lax.broadcasted_iota(jnp.int32, shape, 2)
        red = (gi + gj + gk) % 2 == 0
        omega = self.sor_omega

        def half_sweep(p, mask):
            gs = self._neigh(p, rhs, coeffs) * ap_inv
            p_int = p[I]
            upd = p_int + omega * (gs - p_int)
            return self._exchange(
                p.at[I].set(jnp.where(mask, upd, p_int)))

        def resid(p):
            r = self._neigh(p, rhs, coeffs) - ap * p[I]
            r = r - self._gsum(r) / npts
            return self._gmax(jnp.abs(r))

        # stall carry mirrors solver3d._rbsor_3d exactly (the residuals
        # are psum/pmax-identical on every shard, so trip counts — incl.
        # the f32 floor exit — match serial)
        from ..ops.poisson import PLATEAU_FACTOR, STALL_ITERS

        def cond(carry):
            p, it, r, best, stall = carry
            floored = ((stall >= STALL_ITERS)
                       & (r <= PLATEAU_FACTOR * best))
            return (it < self.sor_max_iter) & (r > tol) & ~floored

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
        p, *_ = lax.while_loop(cond, body, (p, i0, r0, r0, i0))
        return p

    # ---- the per-shard step ----
    def _local_step(self, F, u, v, w, p, phase: int):
        g, fl = self.g, self.fl
        # local extents with the GLOBAL spacing copied verbatim (re-deriving
        # dx from a scaled local Lx would not be bit-identical; cf.
        # parallel/dist.py _LocalGrid)
        gl = _LocalGrid3(nx=self.nxl, ny=self.nyl, nz=g.nz,
                         dx=g.dx, dy=g.dy, dz=g.dz,
                         dxi=g.dxi, dyi=g.dyi, dzi=g.dzi)

        rho, nu = mix_properties(fl, F)
        if self.csf:
            # local Youngs normals (the +-1 F window is covered by the
            # exchanged ghost planes, so every owned cell computes the
            # serial expression on serial values), then exchange the
            # normals so the curvature's +-1 normal window is covered,
            # then exchange kappa so the predictor's face averages are.
            # Wall ghosts stay zero through the exchanges — exactly the
            # serial op's zero-ghost embed (ops/normals3d.py).
            from ..ops.normals3d import (
                curvature_from_normals_3d,
                young_normals_3d,
            )

            mx, my, mz = young_normals_3d(gl, F)
            mx = self._exchange(mx)
            my = self._exchange(my)
            mz = self._exchange(mz)
            kappa = self._exchange(
                curvature_from_normals_3d(gl, mx, my, mz))
        else:
            # surface tension inert (3dvof.py:607)
            kappa = jnp.zeros_like(F)

        # predictor over ALL local faces (u_lo=1; v_lo=1 when y is
        # decomposed); the serial wall faces (global face 1 per axis) are
        # zeroed on the edge shards only
        v_lo = 1 if self.py > 1 else 2
        us, vs, ws = predict_velocity_3d(
            gl, fl, self.dt, u, v, w, F, rho, nu, kappa, u_lo=1,
            v_lo=v_lo)
        us = us.at[1].set(jnp.where(self._is_left(), 0.0, us[1]))
        if self.py > 1:
            vs = vs.at[:, 1].set(jnp.where(self._is_bottom(), 0.0,
                                           vs[:, 1]))
        us, vs, ws = self._exchange(us), self._exchange(vs), self._exchange(ws)

        u, v, w, F, p = self._bc(u, v, w, F, p)
        # rho needs no exchange: it is pointwise in F, whose ghosts entered
        # the step current (end-of-previous-step BC + exchange)
        p = self._solve_pressure(p, us, vs, ws, rho)

        u, v, w = update_velocity_3d(
            gl, self.dt, u, v, w, us, vs, ws, p, rho, u_lo=1, v_lo=v_lo)
        u = u.at[1].set(jnp.where(self._is_left(), 0.0, u[1]))
        if self.py > 1:
            v = v.at[:, 1].set(jnp.where(self._is_bottom(), 0.0, v[:, 1]))
        u, v, w, F, p = self._bc(u, v, w, F, p)

        def sweep_x(F, u):
            gi0 = self._xi() * self.nxl - 2  # ext plane l -> global gi0 + l
            F_ext = self._widen(F)
            u_ext = self._widen(u)
            if self.py == 1:
                out = fct3d_sweep_x_windowed(g, self.dt, F_ext, u_ext, gi0)
            else:
                out = sweep_masked_2axis(g, self.dt, F_ext, u_ext, 0,
                                         gi0, self._yi() * self.nyl)
            return out[2:-2]

        def sweep_y(F, v):
            if self.py == 1:
                return fct3d_sweep_y(g, self.dt, F, v)
            gj0 = self._yi() * self.nyl - 2
            out = sweep_masked_2axis(
                g, self.dt, self._widen_y(F), self._widen_y(v), 1,
                self._xi() * self.nxl, gj0)
            return out[:, 2:-2]

        def sweep_z(F, w):
            # z is never decomposed: every local interior cell is a global
            # interior cell and the serial transpose sweep applies as-is
            return fct3d_sweep_z(g, self.dt, F, w)

        sweeps = {0: ((sweep_x, u), (sweep_y, v), (sweep_z, w)),
                  1: ((sweep_y, v), (sweep_z, w), (sweep_x, u)),
                  2: ((sweep_z, w), (sweep_x, u), (sweep_y, v))}[phase]
        for fn, vel in sweeps:
            F = fn(F, vel)
            F = self._exchange(F)
        F = clamp01(F)
        u, v, w, F, p = self._bc(u, v, w, F, p)
        return F, u, v, w, p

    # ---- resident wide-halo pallas engine (backend='pallas') ----
    def _widen_W(self, a):
        """Entry layout conversion (ONCE per simulate call, outside the
        scan): [lo(W), a, hi(W)] along axis 0. a's own ghost planes stay
        in place mid-block: for interior shards they hold REAL neighbor
        plane values, for edge shards the wall mirrors. lo/hi ship the
        next W planes outward from the neighbors; zeros beyond the walls
        are inert under the kernels' global-index masks. Same slice
        algebra as the XLA engine's _widen (a[-2-w:-2] IS a[nxl-w:nxl]),
        so this is that helper at the resident width."""
        return self._widen(a, self.W)

    def _widen_Wy(self, a):
        """The y twin for the pencil engine: [lo(Wy), a, hi(Wy)] along
        axis 1, on the UNPADDED local block (the sublane pad is appended
        after) — _widen_y at the resident width."""
        return self._widen_y(a, self.Wy)

    def _refresh_halo(self, a):
        """In-place halo refresh on a resident extended block: overwrite
        the (W+1) outermost planes per side with the neighbor's owned
        planes (static-slice .at[].set — XLA applies it as an in-place
        dynamic-update-slice; no whole-block concatenate). Shard s's low
        halo [0, W] holds global planes [s*nxl - W, s*nxl] = the LAST
        W+1 owned planes of shard s-1, which live at its block indices
        [nxl, nxl+W]; symmetrically for the high side. Edge shards keep
        their beyond-wall junk (inert under the global-index masks).

        Pencil engine: a second stage refreshes the (Wy+1) outermost
        COLUMNS per side along y, over the full x extent INCLUDING the
        just-refreshed x halos — so corner halo data lands correctly
        without diagonal communication (cf. _exchange). Explicit end
        indices keep the sublane pad columns untouched."""
        if self.px > 1:
            W, nxl = self.W, self.nxl
            lo = _shift_x(a[nxl: nxl + W + 1], self.ax, self.px, up=True)
            hi = _shift_x(a[W + 1: 2 * W + 2], self.ax, self.px, up=False)
            a = a.at[: W + 1].set(
                jnp.where(self._is_left(), a[: W + 1], lo))
            a = a.at[W + nxl + 1:].set(
                jnp.where(self._is_right(), a[W + nxl + 1:], hi))
        if self.pencil and self.py > 1:
            Wy, nyl = self.Wy, self.nyl
            lo = _shift_x(a[:, nyl: nyl + Wy + 1], self.ay, self.py,
                          up=True)
            hi = _shift_x(a[:, Wy + 1: 2 * Wy + 2], self.ay, self.py,
                          up=False)
            a = a.at[:, : Wy + 1].set(
                jnp.where(self._is_bottom(), a[:, : Wy + 1], lo))
            a = a.at[:, Wy + nyl + 1: 2 * Wy + nyl + 2].set(
                jnp.where(self._is_top(),
                          a[:, Wy + nyl + 1: 2 * Wy + nyl + 2], hi))
        return a

    def _local_step_pallas(self, F, u, v, w, p, phase: int):
        """One step on the RESIDENT jk-padded extended blocks: refresh the
        halos in place, then the whole step via the serial slab kernels
        with (nloc, gi_base) set to the shard's window. The serial step is
        the px=1/gi_base=-W special case up to the sacrificial halo. The
        only non-kernel work per step: the ppermute refresh (px>1) and the
        two masked wall-mirror plane writes on F."""
        import jax as _jax

        from ..pallas_kernels.jacobi3d import pallas_jacobi_3d
        from ..pallas_kernels.step3d import (
            pallas_correct3d,
            pallas_fct3d_sweep,
            pallas_predict3d_rhs,
        )

        interpret = _jax.default_backend() == "cpu"
        g, W, nloc, nxl = self.g, self.W, self.nloc, self.nxl
        gi_base = self._xi() * nxl - W
        kw = {}
        if self.pencil:
            kw = dict(njl=self.nyE,
                      gj_base=self._yi() * self.nyl - self.Wy)

        Fx, ux, vx, wx, pxx = (self._refresh_halo(a)
                               for a in (F, u, v, w, p))
        us, vs, ws, rhs = pallas_predict3d_rhs(
            g, self.fl, self.dt, ux, vx, wx, Fx,
            interpret=interpret, nloc=nloc, gi_base=gi_base,
            csf=self.csf, **kw)
        pj = pallas_jacobi_3d(
            g, self.n_jacobi, pxx, rhs,
            interpret=interpret, nloc=nloc, gi_base=gi_base, **kw)
        uo, vo, wo = pallas_correct3d(
            g, self.fl, self.dt, us, vs, ws, pj, Fx,
            interpret=interpret, nloc=nloc, gi_base=gi_base, **kw)
        vels = (uo, vo, wo)
        Fo = Fx
        for idx, axn in enumerate(_SWEEP_ORDER3[phase]):
            Fo = pallas_fct3d_sweep(
                g, self.dt, Fo, vels[axn], axn, interpret=interpret,
                mirror_out=(idx == 2), nloc=nloc, gi_base=gi_base, **kw)
        # global-wall F ghost planes sit mid-block (the in-plane sweeps
        # processed them); restore the fresh mirror the serial mirror_out
        # writes — the stale-mirror feed the next step's sweeps depend on
        Fo = Fo.at[W].set(
            jnp.where(self._is_left(), Fo[W + 1], Fo[W]))
        Fo = Fo.at[W + nxl + 1].set(
            jnp.where(self._is_right(), Fo[W + nxl], Fo[W + nxl + 1]))
        return Fo, uo, vo, wo, pj

    def _local_step_hybrid(self, F, u, v, w, p, phase: int):
        """The distributed HYBRID step (VERDICT r4 #1): `_local_step_pallas`
        with the resident Jacobi kernel swapped for the DISTRIBUTED
        residual-driven solve (rbsor / parallel-mg) hosted as XLA between
        the slab kernel phases — the sharded counterpart of the serial
        hybrid (solver3d._step_3d_pallas_padded's rbsor/mg branch), so
        production-upgrade runs keep kernel speed for predict + correct +
        all three FCT sweeps.

        Layout: the same resident extended block, with W sized WITHOUT
        the Jacobi erosion (pallas_admission_3d at n_jacobi=0: rhs is
        invalid at the outermost computed plane, correct erodes 1 more,
        the in-axis FCT sweep 3 — W=4, +2 with csf). The solve runs on
        the ring-layout views (owned planes + block ghosts) sliced from
        the extended block; the solved p is re-embedded (pads + beyond-
        ring planes zeroed — p persists, and the pencil pad rows must
        stay zero) and ONE extra halo refresh re-validates its halo
        planes from the neighbors' owned planes, so the correct kernel
        reads globally-valid p across the whole block exactly as it read
        the resident Jacobi's output."""
        import jax as _jax

        from ..pallas_kernels.step3d import (
            pallas_correct3d,
            pallas_fct3d_sweep,
            pallas_predict3d_rhs,
        )

        interpret = _jax.default_backend() == "cpu"
        g, W, nloc, nxl = self.g, self.W, self.nloc, self.nxl
        Wy, nyl = self.Wy, self.nyl
        gi_base = self._xi() * nxl - W
        kw = {}
        if self.pencil:
            kw = dict(njl=self.nyE, gj_base=self._yi() * nyl - Wy)

        Fx, ux, vx, wx, pxx = (self._refresh_halo(a)
                               for a in (F, u, v, w, p))
        us, vs, ws, rhs = pallas_predict3d_rhs(
            g, self.fl, self.dt, ux, vx, wx, Fx,
            interpret=interpret, nloc=nloc, gi_base=gi_base,
            csf=self.csf, **kw)
        # ring-layout views: owned planes + the block ghosts (block index
        # W / W+nxl+1 hold the neighbor's owned boundary plane — exactly
        # the exchanged ghost the XLA step's solve reads)
        sx = slice(W, W + nxl + 2)
        sy = slice(Wy, Wy + nyl + 2)
        nz2 = g.nz + 2
        p_sol = self._solve_upgraded(
            pxx[sx, sy, :nz2],
            rhs[W + 1: W + nxl + 1, Wy + 1: Wy + nyl + 1, 1: g.nz + 1])
        pj = jnp.zeros_like(pxx).at[sx, sy, :nz2].set(p_sol)
        pj = self._refresh_halo(pj)
        uo, vo, wo = pallas_correct3d(
            g, self.fl, self.dt, us, vs, ws, pj, Fx,
            interpret=interpret, nloc=nloc, gi_base=gi_base, **kw)
        vels = (uo, vo, wo)
        Fo = Fx
        for idx, axn in enumerate(_SWEEP_ORDER3[phase]):
            Fo = pallas_fct3d_sweep(
                g, self.dt, Fo, vels[axn], axn, interpret=interpret,
                mirror_out=(idx == 2), nloc=nloc, gi_base=gi_base, **kw)
        Fo = Fo.at[W].set(
            jnp.where(self._is_left(), Fo[W + 1], Fo[W]))
        Fo = Fo.at[W + nxl + 1].set(
            jnp.where(self._is_right(), Fo[W + nxl], Fo[W + nxl + 1]))
        return Fo, uo, vo, wo, pj

    # ---- host-side layout conversion ----
    def _spec(self):
        return P(self.ax) if self.ay is None else P(self.ax, self.ay)

    def scatter_state(self, state: State3D) -> State3D:
        def scatter(arr):
            arr = np.asarray(arr)
            rows = []
            for ci in range(self.px):
                cols = []
                for cj in range(self.py):
                    i0, j0 = ci * self.nxl, cj * self.nyl
                    cols.append(arr[i0: i0 + self.nxl + 2,
                                    j0: j0 + self.nyl + 2])
                rows.append(np.concatenate(cols, axis=1))
            blocked = np.concatenate(rows, axis=0)
            sharding = NamedSharding(self.mesh, self._spec())
            return jax.device_put(jnp.asarray(blocked), sharding)

        return State3D(*(scatter(a) for a in state))

    def gather_state(self, state: State3D) -> State3D:
        g = self.g

        def gather(blocked):
            b = np.asarray(blocked)
            out = np.zeros((g.nx + 2, g.ny + 2) + b.shape[2:], b.dtype)
            H, Wd = self.nxl + 2, self.nyl + 2
            for ci in range(self.px):
                for cj in range(self.py):
                    blk = b[ci * H: (ci + 1) * H, cj * Wd: (cj + 1) * Wd]
                    out[ci * self.nxl + 1: (ci + 1) * self.nxl + 1,
                        cj * self.nyl + 1: (cj + 1) * self.nyl + 1] = \
                        blk[1:-1, 1:-1]
            return jnp.asarray(out)

        from ..ops import apply_bc_3d

        # rebuild ghosts with the REAL BCs (a blanket x-mirror put nonzero
        # values on u's wall ghost plane, which set_BC zeroes; cf. the 2-D
        # gather_state fix)
        F, u, v, w, p = (gather(a) for a in state)
        u, v, w, F, p = apply_bc_3d(u, v, w, F, p)
        return State3D(F=F, u=u, v=v, w=w, p=p)

    # ---- public API ----
    def make_simulate(self):
        spec = self._spec()
        use_pallas = self.backend == "pallas"

        @partial(jax.jit, static_argnums=(1, 2))
        def run(state: State3D, n_steps: int, istep0: int = 0) -> State3D:
            # istep0: last global step already taken — the istep % 3 sweep
            # rotation continues across chunked calls like the reference
            ph1 = (istep0 + 1) % 3

            def body(F, u, v, w, p):
                if use_pallas:
                    # entry BC + exchange (first step's pre-sweep mirrors,
                    # cf. solver3d.simulate_3d), then jk-pad and widen to
                    # the resident extended layout ONCE, outside the scan
                    u, v, w, F, p = self._bc(u, v, w, F, p)
                    from ..solver3d import _pad_jk

                    if self.pencil:
                        # y-widen BEFORE the sublane pad (the pad must
                        # land beyond the high halo), with LOCAL pad
                        # amounts — the pencil planes are (nyE+2, nz+2)
                        F, u, v, w, p = (
                            self._widen_Wy(a) for a in (F, u, v, w, p))
                        pj, pk = self._pencil_pad()
                    else:
                        pj, pk = _pad_jk(self.g)
                    F, u, v, w, p = (
                        jnp.pad(a, ((0, 0), (0, pj), (0, pk)))
                        for a in (F, u, v, w, p))
                    F, u, v, w, p = (
                        self._widen_W(a) for a in (F, u, v, w, p))
                    step = (self._local_step_hybrid if self.hybrid
                            else self._local_step_pallas)
                else:
                    step = self._local_step

                def triple(carry, _):
                    s = carry
                    for k in range(3):
                        s = step(*s, (ph1 + k) % 3)
                    return s, None

                n_triples, rem = divmod(n_steps, 3)
                carry, _ = lax.scan(triple, (F, u, v, w, p), None,
                                    length=n_triples)
                for r in range(rem):
                    carry = step(*carry, (ph1 + r) % 3)
                if use_pallas:
                    # slice the resident extended block back to the narrow
                    # local layout ONCE (center nxl planes + block ghosts)
                    sl = slice(self.W, self.W + self.nxl + 2)
                    sy = slice(self.Wy, self.Wy + self.nyl + 2)
                    n2p = self.g.nz + 2
                    F, u, v, w, p = (a[sl, sy, :n2p] for a in carry)
                    # exit BC: u/v/w/p ghost parity of the returned state
                    u, v, w, F, p = self._bc(u, v, w, F, p)
                    carry = (F, u, v, w, p)
                return carry

            F, u, v, w, p = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(spec,) * 5, out_specs=(spec,) * 5,
                # pallas_call out_shapes carry no vma annotation (jax 0.9)
                check_vma=False,
            )(state.F, state.u, state.v, state.w, state.p)
            return State3D(F=F, u=u, v=v, w=w, p=p)

        # reduce istep0 to its phase residue so chunked drivers compile
        # at most three programs per shape
        return lambda state, n_steps, istep0=0: run(
            state, n_steps, istep0 % 3)

    def simulate(self, state: State3D, n_steps: int,
                 istep0: int = 0) -> State3D:
        if self._run is None:
            self._run = self.make_simulate()
        blocked = self.scatter_state(state)
        out = self._run(blocked, n_steps, istep0)
        return self.gather_state(out)
