"""Mesh planning: rank (px, py) decompositions for a grid + chip count.

The scaling-book recipe is "pick a mesh, annotate shardings, let XLA
insert collectives" — this module automates the FIRST step for this
framework's engines, using the same admission rules the engines enforce
(dist3d.pallas_admission_3d; the 2-D shard helpers in
pallas_kernels/step_kernels.py) plus a transparent relative-cost model:

  score ~ engine_class_speed / work_factor

  work_factor        swept elements per chip / owned elements per chip
                     (wide-halo cones + sublane/lane padding are the
                     real per-chip cost; owned work is mesh-invariant
                     at fixed chip count, so ranking needs only this)
  engine_class_speed measured throughput class of each engine on the
                     v5e (BASELINE.md): 2-D full-block/strips 1.0,
                     tiled loop 0.6, XLA per-shard 0.3; 3-D slab/pencil
                     1.0 with the measured B-chunk penalty
                     (B=8 1.0, 4 0.93, 2 0.87, 1 0.8), XLA 0.12.

Scores RANK configurations; they are not absolute CUPS predictions.
Pure shape math — no jax.Device needed, so you can plan a 256-chip pod
mesh from a 1-chip host (CLI: `python -m tpuvof --plan-mesh N
[--three-d]`). The reference has no distributed execution to compare
against (SURVEY.md section 5).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..config import SimConfig
from ..grid import Grid3D

__all__ = ["MeshPlan", "plan_mesh_2d", "plan_mesh_3d", "format_plans"]

_B_SPEED = {8: 1.0, 4: 0.93, 2: 0.87, 1: 0.8}


@dataclass(frozen=True)
class MeshPlan:
    """One ranked decomposition candidate."""

    px: int
    py: int
    engine: str          # 'pallas-full'|'pallas-strips'|'pallas-tiled'|
    #                      'pallas-slab'|'pallas-pencil'|'xla'
    work_factor: float   # swept/owned elements per chip (>= 1)
    score: float         # engine_class_speed / work_factor (relative)
    halo_mb_step: float  # ppermute payload per step, MB (all fields)
    detail: str          # engine geometry (W, B, strip height, ...)

    @property
    def mesh_shape(self) -> tuple[int, int]:
        return (self.px, self.py)


def _divisor_pairs(n: int):
    for px in range(1, n + 1):
        if n % px == 0:
            yield px, n // px


def plan_mesh_2d(cfg: SimConfig, n_devices: int) -> list[MeshPlan]:
    """Ranked (px, py) meshes for the 2-D solver (Decomp). Every engine
    the shard auto-routing can pick is modeled: resident full-block
    windowed kernel inside the VMEM envelope, strip-streaming beyond it,
    the tiled loop as fallback, XLA per-shard last."""
    from ..pallas_kernels.step_kernels import (
        WINDOWED_FIELDS,
        fits_vmem_2d,
        pick_tile_2d,
        step_halo_width,
        strips_layout_2d,
    )

    g = cfg.grid
    W = step_halo_width(cfg)
    plans = []
    for px, py in _divisor_pairs(n_devices):
        if g.nx % px or g.ny % py:
            continue
        nxl, nyl = g.nx // px, g.ny // py
        owned = nxl * nyl
        halo_ok = not ((px > 1 and nxl < W + 1) or (py > 1 and nyl < W + 1))
        # ppermute payload: (W+1)-band per sharded axis side over the
        # RESIDENT extended extent of the other axis, 4 fields
        halo = 0.0
        if px > 1:
            halo += 2 * (W + 1) * (nyl + 2 * W + 2) * 4
        if py > 1:
            halo += 2 * (W + 1) * (nxl + 2 * W + 2) * 4
        halo_mb = halo * 4 / 2**20
        # all engines' swept counts in the SAME units: the (8,128)-padded
        # block extents their Mosaic programs actually sweep, ghost ring
        # included (mixing padded strips counts with unpadded full-block
        # counts skewed borderline rankings)
        def padded(rows, lanes):
            return (-(-rows // 8) * 8) * (-(-lanes // 128) * 128)

        engine, swept, speed, detail = "xla", owned, 0.3, "per-shard XLA"
        if halo_ok:
            if fits_vmem_2d(nxl + 2 * W, nyl + 2 * W,
                            fields=WINDOWED_FIELDS):
                engine = "pallas-full"
                swept = padded(nxl + 2 * W + 2, nyl + 2 * W + 2)
                speed = 1.0
                detail = f"W={W} resident block"
            elif (lay := strips_layout_2d(cfg, extents=(nxl, nyl))) \
                    is not None:
                Tx, W2, P0, P1, Exp, Lout, ntx = lay
                engine = "pallas-strips"
                swept = ntx * Exp * P1  # already (8,128)-padded
                speed = 1.0
                detail = f"W={W} strips Tx={Tx} x{ntx}"
            elif (tile := pick_tile_2d(nxl, nyl, W)) is not None:
                engine = "pallas-tiled"
                tx, ty = tile
                swept = (nxl // tx) * (nyl // ty) \
                    * padded(tx + 2 * W + 2, ty + 2 * W + 2)
                speed = 0.6
                detail = f"W={W} tiles {tx}x{ty}"
        wf = swept / owned
        plans.append(MeshPlan(px, py, engine, round(wf, 3),
                              round(speed / wf, 4), round(halo_mb, 3),
                              detail))
    plans.sort(key=lambda p: -p.score)
    return plans


def plan_mesh_3d(g: Grid3D, n_devices: int,
                 n_jacobi: int = 10) -> list[MeshPlan]:
    """Ranked (px, py) meshes for the 3-D solver (Decomp3D): x slabs
    (py=1) and (x,y) pencils, using the engines' own admission function
    (dist3d.pallas_admission_3d) so a top-ranked plan is guaranteed to
    actually run the pallas engine."""
    from .dist3d import _pad_planes, pallas_admission_3d

    plans = []
    for px, py in _divisor_pairs(n_devices):
        if g.nx % px or g.ny % py:
            continue
        nxl, nyl = g.nx // px, g.ny // py
        owned = nxl * nyl * g.nz
        adm = pallas_admission_3d(g, px, py, n_jacobi)
        pj, pk = _pad_planes(adm["nyE"], g.nz)
        plane = (adm["nyE"] + 2 + pj) * (g.nz + 2 + pk)
        halo = 0.0
        if px > 1:
            halo += 2 * (adm["W"] + 1) * plane * 5
        if py > 1:
            halo += 2 * (adm["Wy"] + 1) * (adm["nloc"] + 2) \
                * (g.nz + 2 + pk) * 5
        halo_mb = halo * 4 / 2**20
        if adm["ok"]:
            engine = "pallas-pencil" if adm["pencil"] else "pallas-slab"
            swept = (adm["nloc"] + 2) * plane
            speed = _B_SPEED.get(adm["B"], 0.8)
            detail = (f"W={adm['W']} B={adm['B']}"
                      + (f" Wy={adm['Wy']}" if adm["pencil"] else ""))
        else:
            engine, swept, speed = "xla", owned, 0.12
            detail = adm["why"]
        wf = swept / owned
        plans.append(MeshPlan(px, py, engine, round(wf, 3),
                              round(speed / wf, 4), round(halo_mb, 3),
                              detail))
    plans.sort(key=lambda p: -p.score)
    return plans


def format_plans(plans: list[MeshPlan]) -> str:
    """Human-readable ranking table (CLI --plan-mesh)."""
    if not plans:
        return "no mesh shape divides this grid at that device count"
    lines = [f"{'mesh':>8}  {'engine':<14} {'work x':>7} {'score':>7} "
             f"{'halo MB/step':>12}  detail"]
    for p in plans:
        lines.append(f"{p.px:>3}x{p.py:<4}  {p.engine:<14} "
                     f"{p.work_factor:>7} {p.score:>7} "
                     f"{p.halo_mb_step:>12}  {p.detail}")
    return "\n".join(lines)
