"""Pure-advection scheme-verification cases and driver.

Re-design of test/forward_fct.py: the FCT kernels run in isolation (no
Navier-Stokes) under a fixed analytic velocity field. The reference ships
the Kothe-Rider single vortex active plus translation / Zalesak slotted
disk / checkerboard as commented fixtures (test/forward_fct.py:108-197);
all are first-class here.

Scheme details replicated exactly: the flux-only dV compensation without
in-sweep clamping (FCT_SCHEME_TEST variant, eps=1e-4 in the limiter
denominator), F-ghost mirroring between half sweeps, and 0-based sweep
parity (first step runs y then x — unlike the main solver whose counter
pre-increments; SURVEY.md §2.5.2).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FCTVariant, Numerics, FCT_SCHEME_TEST
from ..grid import Grid2D
from ..ops.fct import rudman_advect
from ..state import find_area

__all__ = [
    "AdvectionCase",
    "single_vortex",
    "zalesak_disk",
    "translation",
    "checkerboard",
    "simulate_advection",
    "ADVECTION_CASES",
]


@dataclass(frozen=True)
class AdvectionCase:
    """A fixed-velocity VOF advection problem."""

    grid: Grid2D
    dt: float
    n_steps: int  # canonical duration (tmax in the reference)
    fct: FCTVariant = FCT_SCHEME_TEST

    def numerics(self) -> Numerics:
        return Numerics(dt=self.dt, fct=self.fct, bc_between_sweeps=True)


def _centers(g: Grid2D):
    """Cell centers xm[i] = (x[i] + x[i+1]) / 2 over the padded index range
    (reference grid_staggered, test/forward_fct.py:58-65)."""
    xs = np.hstack((0.0, np.linspace(0.0, g.Lx, g.nx + 1), g.Lx)).astype(np.float32)
    ys = np.hstack((0.0, np.linspace(0.0, g.Ly, g.ny + 1), g.Ly)).astype(np.float32)
    xm = 0.5 * (xs[: g.nx + 2] + xs[1 : g.nx + 3])
    ym = 0.5 * (ys[: g.ny + 2] + ys[1 : g.ny + 3])
    return xm.astype(np.float32), ym.astype(np.float32)


def _face_coords(g: Grid2D):
    """Evaluation points of the staggered velocity components: u at
    (xm - dx/2, ym), v at (xm, ym - dy/2) (test/forward_fct.py:196-200)."""
    xm, ym = _centers(g)
    ux = (xm - np.float32(g.dx) / 2)[:, None]
    uy = ym[None, :]
    vx = xm[:, None]
    vy = (ym - np.float32(g.dy) / 2)[None, :]
    return ux, uy, vx, vy


def _mirror_velocity_bc(u, v, g):
    """The test program's velocity ghost mirrors (test/forward_fct.py:206-220)."""
    u[:, 0] = u[:, 1]
    v[:, 1] = v[:, 2]
    u[:, -1] = u[:, -2]
    v[:, -1] = v[:, -2]
    u[1, :] = u[2, :]
    v[0, :] = v[1, :]
    u[-1, :] = u[-2, :]
    v[-1, :] = v[-2, :]
    return u, v



def single_vortex(n: int = 500, tmax: int = 1000, dt: float = 1e-4):
    """Kothe-Rider single vortex deforming a circle (the active fixture,
    test/forward_fct.py:131-137, 196-204).

    Returns (case, F0, u, v, F_target)."""
    g = Grid2D(n, n, Lx=float(np.pi), Ly=float(np.pi))
    case = AdvectionCase(grid=g, dt=dt, n_steps=tmax)
    xm, ym = _centers(g)

    # circle at (Lx/2, 3Ly/4), r = Lx/10; find_area gives 1 outside
    F0 = find_area(g, g.Lx / 2, g.Ly * 3 / 4, g.Lx / 10)
    target = F0.copy()

    ux, uy, vx, vy = _face_coords(g)
    scale = np.float32(g.Lx * 1.0 / dt / tmax * 2)
    u = np.zeros(g.shape, np.float32)
    v = np.zeros(g.shape, np.float32)
    u[1:-1, 1:-1] = (-np.sin(ux) ** 2 * np.sin(2 * uy) * scale)[1:-1, 1:-1]
    v[1:-1, 1:-1] = (np.sin(vy) ** 2 * np.sin(2 * vx) * scale)[1:-1, 1:-1]
    u, v = _mirror_velocity_bc(u, v, g)
    return case, jnp.asarray(F0), jnp.asarray(u), jnp.asarray(v), jnp.asarray(target)


def zalesak_disk(n: int = 200, tmax: int = 1000, dt: float = 1e-4, omega: float = 3.0):
    """Zalesak's rotating slotted disk (commented fixture,
    test/forward_fct.py:141-166, 186-193): solid-body rotation about the
    domain center. With the fixture's literal parameters the canonical
    duration rotates omega*tmax*dt = 0.3 rad (~17 deg), NOT a full
    revolution, so the returned target (= the initial disk) is a
    shape-preservation yardstick, not the exact end state; a full
    revolution needs omega = 2*pi/(tmax*dt) ~ 62.8."""
    g = Grid2D(n, n, Lx=float(np.pi), Ly=float(np.pi))
    case = AdvectionCase(grid=g, dt=dt, n_steps=tmax)
    xm, ym = _centers(g)

    cx, cy, r = g.Lx * 3.0 / 4, g.Ly * 3.0 / 4, g.Lx / 10
    F0 = find_area(g, cx, cy, r)
    sw, sh = r / 6.0, r * 0.8
    slot = (np.abs(xm[:, None] - cx) < sw) & (np.abs(ym[None, :] - cy + r / 4) < sh)
    F0 = np.where(slot, np.float32(1.0), F0)

    ux, uy, vx, vy = _face_coords(g)
    u = np.zeros(g.shape, np.float32)
    v = np.zeros(g.shape, np.float32)
    u[1:-1, 1:-1] = (-omega * (uy - g.Ly / 2) * np.ones_like(ux))[1:-1, 1:-1]
    v[1:-1, 1:-1] = (omega * (vx - g.Lx / 2) * np.ones_like(vy))[1:-1, 1:-1]
    u, v = _mirror_velocity_bc(u, v, g)
    return case, jnp.asarray(F0), jnp.asarray(u), jnp.asarray(v), jnp.asarray(F0.copy())


def translation(n: int = 200, tmax: int = 200, dt: float = 1e-4):
    """Uniform translation: one cell per step (commented fixture,
    test/forward_fct.py:181-184)."""
    g = Grid2D(n, n, Lx=float(np.pi), Ly=float(np.pi))
    case = AdvectionCase(grid=g, dt=dt, n_steps=tmax)
    F0 = find_area(g, g.Lx / 2, g.Ly / 2, g.Lx / 10)
    speed = np.float32(g.Lx / g.nx / dt)
    u = np.full(g.shape, speed, np.float32)
    v = np.zeros(g.shape, np.float32)
    return case, jnp.asarray(F0), jnp.asarray(u), jnp.asarray(v), jnp.asarray(F0.copy())


def checkerboard(n: int = 121, tmax: int = 100, dt: float = 1e-4):
    """Checkerboard stress pattern in the vortex field (commented fixture,
    test/forward_fct.py:159-166): 11x11 tiles of alternating 0/1."""
    g = Grid2D(n, n, Lx=float(np.pi), Ly=float(np.pi))
    case = AdvectionCase(grid=g, dt=dt, n_steps=tmax)
    i = np.arange(g.nx + 2)[:, None] // 11
    j = np.arange(g.ny + 2)[None, :] // 11
    F0 = ((i + j) % 2 != 0).astype(np.float32)

    ux, uy, vx, vy = _face_coords(g)
    scale = np.float32(g.Lx / dt / tmax * 2)
    u = np.zeros(g.shape, np.float32)
    v = np.zeros(g.shape, np.float32)
    u[1:-1, 1:-1] = (-np.sin(ux) ** 2 * np.sin(2 * uy) * scale)[1:-1, 1:-1]
    v[1:-1, 1:-1] = (np.sin(vy) ** 2 * np.sin(2 * vx) * scale)[1:-1, 1:-1]
    u, v = _mirror_velocity_bc(u, v, g)
    return case, jnp.asarray(F0), jnp.asarray(u), jnp.asarray(v), jnp.asarray(F0.copy())


ADVECTION_CASES = {
    "single_vortex": single_vortex,
    "zalesak_disk": zalesak_disk,
    "translation": translation,
    "checkerboard": checkerboard,
}


def simulate_advection(case: AdvectionCase, F, u, v, n_steps: int,
                       istep0: int = 0):
    """Advect F for n_steps under the fixed staggered velocity (u, v).

    Matches the test program's schedule: 0-based parity (step 0 sweeps
    y then x) with F ghost mirroring around each half sweep. Chunked
    callers (the CLI frame loop) pass ``istep0`` (steps already taken) so
    the parity continues across calls; reduced mod 2 before the jitted
    core, like solver.simulate."""
    return _simulate_advection_impl(case, F, u, v, n_steps, istep0 % 2)


@partial(jax.jit, static_argnums=(0, 4, 5))
def _simulate_advection_impl(case: AdvectionCase, F, u, v, n_steps: int,
                             istep0: int):
    from ..ops.bc import mirror_scalar

    g = case.grid
    nm = case.numerics()
    F = mirror_scalar(F)  # the test program's initial set_BC(0, F)
    even1 = istep0 % 2 == 0  # 0-based: step istep0 is even-parity iff even

    def pair(F, _):
        F = rudman_advect(g, nm, F, u, v, even_step=even1)
        F = rudman_advect(g, nm, F, u, v, even_step=not even1)
        return F, None

    n_pairs, rem = divmod(n_steps, 2)
    F, _ = jax.lax.scan(pair, F, None, length=n_pairs)
    if rem:
        F = rudman_advect(g, nm, F, u, v, even_step=even1)
    return F
