"""Mesh planner (parallel/plan.py): pure shape math, ranked by the same
admission rules the engines enforce — a top-ranked plan must actually
run its claimed engine when a Decomp/Decomp3D is built at that shape."""
import numpy as np
import pytest
import jax
from jax.sharding import Mesh

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.parallel import (
    Decomp3D,
    format_plans,
    pallas_admission_3d,
    plan_mesh_2d,
    plan_mesh_3d,
)


def test_plan_3d_flagship_8_chips_prefers_pencil():
    """200^3 on 8 chips: x-slabs are INADMISSIBLE (nx/px = 25 is odd —
    the slab-chunk alignment can never be met), so every pallas-capable
    shape is a pencil; the planner must rank one first and mark 8x1 as
    the XLA fallback with the admission reason."""
    plans = plan_mesh_3d(Grid3D(200, 200, 200), 8)
    assert plans[0].engine == "pallas-pencil"
    assert plans[0].score == max(p.score for p in plans)
    slab = next(p for p in plans if (p.px, p.py) == (8, 1))
    assert slab.engine == "xla" and "even" in slab.detail


def test_plan_3d_slab_when_it_fits():
    plans = plan_mesh_3d(Grid3D(64, 64, 64), 2)
    shapes = {(p.px, p.py): p for p in plans}
    assert shapes[(2, 1)].engine == "pallas-slab"
    assert shapes[(1, 2)].engine == "pallas-pencil"


def test_plan_3d_agrees_with_decomp3d_admission():
    """The planner's verdicts are the constructor's: an admitted shape
    builds without the fallback warning; a rejected one warns."""
    g = Grid3D(32, 32, 32)
    adm = pallas_admission_3d(g, 2, 2, n_jacobi=2)
    assert adm["ok"] and adm["pencil"]
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    dec = Decomp3D(g, Mesh(devs, ("mx", "my")), n_jacobi=2,
                   backend="pallas")
    assert dec.backend == "pallas" and dec.pencil
    assert (dec.W, dec.Wy, dec.nloc, dec.nyE) == (
        adm["W"], adm["Wy"], adm["nloc"], adm["nyE"])

    bad = pallas_admission_3d(g, 2, 4)  # ny/py = 8 < Wy+1 = 15
    assert not bad["ok"] and "ny/py" in bad["why"]


def test_admission_table_512_cube():
    """BASELINE.md's beyond-envelope scale-out claim, pinned (VERDICT r4
    #7): 512^3 admits on a 2x8 pencil mesh (290-plane x (96x640) extended
    block, B=8 chunked Jacobi inside the VMEM cap), is REJECTED on 2x4
    (the (160x640) planes put the resident volume past the cap), and
    admits on 4x4. scripts/tpu_pencil_512_shard.py compiles + executes
    the (2,8) per-shard program at this exact geometry on real hardware
    — the round-5 run that exposed the 2x-window VMEM accounting bug the
    current jacobi3d._vmem_need model replaces."""
    g = Grid3D(512, 512, 512)

    a28 = pallas_admission_3d(g, 2, 8)
    assert a28["ok"] and a28["pencil"]
    assert (a28["W"], a28["Wy"], a28["nloc"], a28["nyE"], a28["B"]) == \
        (16, 14, 288, 92, 8)
    assert a28["plane"] == (96, 640)

    a24 = pallas_admission_3d(g, 2, 4)
    assert not a24["ok"] and a24["B"] is None
    assert "VMEM" in a24["why"]

    a44 = pallas_admission_3d(g, 4, 4)
    assert a44["ok"] and a44["B"] == 8

    # the planner's verdicts agree: 16-chip shapes rank pencil engines,
    # the 8-chip (2,4) shape is marked as the XLA fallback
    verdicts16 = {(p.px, p.py): p.engine for p in plan_mesh_3d(g, 16)}
    assert verdicts16[(2, 8)] == "pallas-pencil"
    assert verdicts16[(4, 4)] == "pallas-pencil"
    verdicts8 = {(p.px, p.py): p.engine for p in plan_mesh_3d(g, 8)}
    assert verdicts8[(2, 4)] == "xla"


def test_plan_2d_within_envelope_uses_full_block():
    cfg = tv.SimConfig(grid=tv.Grid2D(512, 512))
    plans = plan_mesh_2d(cfg, 4)
    assert plans and plans[0].engine == "pallas-full"
    assert all(plans[i].score >= plans[i + 1].score
               for i in range(len(plans) - 1))


def test_plan_2d_beyond_envelope_uses_streaming_engine():
    """Shards whose extended block exceeds VMEM must NOT be ranked as
    full-block: 8192^2 on 4 chips -> 4096^2-class shards stream."""
    cfg = tv.SimConfig(grid=tv.Grid2D(8192, 8192))
    plans = plan_mesh_2d(cfg, 4)
    assert plans[0].engine in ("pallas-strips", "pallas-tiled")


def test_plan_formatting_and_no_fit():
    assert "mesh" in format_plans(plan_mesh_3d(Grid3D(64, 64, 64), 2))
    # 7 devices divide nothing in a 64^2 grid except 1x7/7x1, which
    # don't divide 64 -> empty plan list, friendly message
    msg = format_plans(plan_mesh_2d(tv.SimConfig(grid=tv.Grid2D(64, 64)),
                                    7))
    assert "no mesh shape" in msg
