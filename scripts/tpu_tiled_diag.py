"""Diagnose the 2048^2 tiled-vs-XLA 10-step delta: stitching bug or the
known kernel-vs-XLA f32 reassociation noise amplified by the interface
dynamics?

Yardstick A: mono-vs-xla at 512^2 over the SAME 10 steps — the accepted
kernel noise under identical amplification physics (no tiling involved).
Yardstick B: tiled(T=128, 16 tiles)-vs-mono at 512^2 over 10 steps — the
tiling delta ISOLATED from the kernel-vs-XLA delta (same kernel math on
windows vs the whole field).
If B << A, the tiled engine adds no error beyond window-shape FMA noise
and the 2048^2 reading is amplification, not a bug.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tpuvof as tv
import tpuvof.pallas_kernels.step_kernels as sk

print("backend:", jax.default_backend(), flush=True)

N = 512
cfg_x = tv.SimConfig(grid=tv.Grid2D(N, N), num=tv.Numerics(backend="xla"))
cfg_m = cfg_x.replace(num=tv.Numerics(backend="pallas_mono"))
s0 = tv.init_state(cfg_x, ic=1)

a = tv.simulate(cfg_x, s0, 10)
m = tv.simulate(cfg_m, s0, 10)
np.asarray(a.F[:1, :1]), np.asarray(m.F[:1, :1])


def delta(x, y, tag):
    d = {n: float(jnp.abs(getattr(x, n) - getattr(y, n)).max())
         for n in ("F", "u", "v", "p")}
    print(tag, " ".join(f"d{n}={v:.3e}" for n, v in d.items()), flush=True)
    return d


delta(m, a, "A 512^2 10-step mono-vs-xla:   ")

# force the tiled engine with 4x4 tiles of 128 at 512^2
orig = sk.pick_tile_2d
sk.pick_tile_2d = lambda nx, ny, W: 128
try:
    cfg_t = cfg_x.replace(num=tv.Numerics(backend="pallas_tiled"))
    t = tv.simulate(cfg_t, s0, 10)
    np.asarray(t.F[:1, :1])
finally:
    sk.pick_tile_2d = orig

delta(t, m, "B 512^2 10-step tiled-vs-mono: ")
delta(t, a, "  512^2 10-step tiled-vs-xla:  ")
