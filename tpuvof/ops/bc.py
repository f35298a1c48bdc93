"""Ghost-cell boundary conditions as pure functions.

Replicates the reference `set_BC` (2dvof.py:162-189) exactly, including the
corner-cell semantics: Taichi executes the bottom/top pass before the
left/right pass, so corner ghosts end up holding the value mirrored through
the *side* neighbor of an already-mirrored bottom/top ghost. The functional
version applies the j-boundaries first and then the i-boundaries reading the
updated arrays, which reproduces that order.

Walls: bottom slip (u mirrored, v=0 at the wall face), top nominally "open"
but with v=0 enforced (an effective slip lid — reference quirk, 2dvof.py:173),
left/right slip with no-penetration (u=0 on the wall faces). Scalar fields
(F, p, rho) are ghost-mirrored with zero-gradient.
"""
from __future__ import annotations

__all__ = ["apply_bc", "mirror_scalar", "apply_bc_3d"]


def mirror_scalar(a):
    """Zero-gradient mirror of a cell-centered scalar into the ghost ring.

    j-boundaries first, then i-boundaries (corner order as in the reference).
    """
    a = a.at[:, 0].set(a[:, 1])
    a = a.at[:, -1].set(a[:, -2])
    a = a.at[0, :].set(a[1, :])
    a = a.at[-1, :].set(a[-2, :])
    return a


def apply_bc(u, v, F, p, rho=None):
    """Apply all wall boundary conditions; returns updated (u, v, F, p[, rho])."""
    # ---- bottom (j = jmin-1 ghosts / jmin faces) and top ----
    u = u.at[:, 0].set(u[:, 1])
    u = u.at[:, -1].set(u[:, -2])
    v = v.at[:, 1].set(0.0)
    v = v.at[:, -1].set(0.0)  # "open" top still pins v (reference 2dvof.py:173)
    F = F.at[:, 0].set(F[:, 1])
    F = F.at[:, -1].set(F[:, -2])
    p = p.at[:, 0].set(p[:, 1])
    p = p.at[:, -1].set(p[:, -2])
    if rho is not None:
        rho = rho.at[:, 0].set(rho[:, 1])
        rho = rho.at[:, -1].set(rho[:, -2])

    # ---- left and right (reads see the updated j-ghosts: corner order) ----
    u = u.at[1, :].set(0.0)
    u = u.at[-1, :].set(0.0)
    v = v.at[0, :].set(v[1, :])
    v = v.at[-1, :].set(v[-2, :])
    F = F.at[0, :].set(F[1, :])
    F = F.at[-1, :].set(F[-2, :])
    p = p.at[0, :].set(p[1, :])
    p = p.at[-1, :].set(p[-2, :])
    if rho is not None:
        rho = rho.at[0, :].set(rho[1, :])
        rho = rho.at[-1, :].set(rho[-2, :])
        return u, v, F, p, rho
    return u, v, F, p


def apply_bc_3d(u, v, w, F, p, rho=None):
    """3-D walls (reference 3dvof.py:142-190): y-faces, then x-faces, then
    z-faces, matching the kernel's sequential loop order at edges/corners."""
    # bottom / top (y)
    u = u.at[:, 0, :].set(u[:, 1, :])
    u = u.at[:, -1, :].set(u[:, -2, :])
    v = v.at[:, 1, :].set(0.0)
    v = v.at[:, -1, :].set(0.0)
    w = w.at[:, 0, :].set(w[:, 1, :])
    w = w.at[:, -1, :].set(w[:, -2, :])
    F = F.at[:, 0, :].set(F[:, 1, :])
    F = F.at[:, -1, :].set(F[:, -2, :])
    p = p.at[:, 0, :].set(p[:, 1, :])
    p = p.at[:, -1, :].set(p[:, -2, :])
    if rho is not None:
        rho = rho.at[:, 0, :].set(rho[:, 1, :])
        rho = rho.at[:, -1, :].set(rho[:, -2, :])

    # left / right (x)
    u = u.at[1, :, :].set(0.0)
    u = u.at[-1, :, :].set(0.0)
    v = v.at[0, :, :].set(v[1, :, :])
    v = v.at[-1, :, :].set(v[-2, :, :])
    w = w.at[0, :, :].set(w[1, :, :])
    w = w.at[-1, :, :].set(w[-2, :, :])
    F = F.at[0, :, :].set(F[1, :, :])
    F = F.at[-1, :, :].set(F[-2, :, :])
    p = p.at[0, :, :].set(p[1, :, :])
    p = p.at[-1, :, :].set(p[-2, :, :])
    if rho is not None:
        rho = rho.at[0, :, :].set(rho[1, :, :])
        rho = rho.at[-1, :, :].set(rho[-2, :, :])

    # front / back (z)
    u = u.at[:, :, 0].set(u[:, :, 1])
    u = u.at[:, :, -1].set(u[:, :, -2])
    v = v.at[:, :, 0].set(v[:, :, 1])
    v = v.at[:, :, -1].set(v[:, :, -2])
    w = w.at[:, :, 1].set(0.0)
    w = w.at[:, :, -1].set(0.0)
    F = F.at[:, :, 0].set(F[:, :, 1])
    F = F.at[:, :, -1].set(F[:, :, -2])
    p = p.at[:, :, 0].set(p[:, :, 1])
    p = p.at[:, :, -1].set(p[:, :, -2])
    if rho is not None:
        rho = rho.at[:, :, 0].set(rho[:, :, 1])
        rho = rho.at[:, :, -1].set(rho[:, :, -2])
        return u, v, w, F, p, rho
    return u, v, w, F, p
