"""Debug: tiled hybrid phases vs whole-field phase kernels at f64."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import tpuvof as tv
from tpuvof.solver import _step_pallas_hybrid_tiled, _step_pallas
from tpuvof.pallas_kernels.step_kernels import (
    PHASE_HALO, pallas_predict, pallas_predict_win, pallas_fct_sweep_x,
    pallas_fct_sweep_y, pallas_fct_sweep_win)

num = dict(pressure_solver="rbsor", sor_tol=1e-6, sor_max_iter=5000)
cfg = tv.SimConfig(grid=tv.Grid2D(32, 64, Lx=0.1, Ly=0.2),
                   num=tv.Numerics(backend="xla", **num))
state = tv.init_state(cfg, ic=1)
state = tv.State(*(jnp.asarray(np.asarray(a), jnp.float64) for a in state))
F, u, v, p = state

# whole-field predict
us_w, vs_w = pallas_predict(cfg, u, v, F, interpret=True)

# whole-field via the win kernel at oi=oj=-W on a W-padded field
W = PHASE_HALO
pads = [jnp.pad(a, W) for a in (u, v, F)]
us_e, vs_e = pallas_predict_win(cfg, *pads, -W, -W, interpret=True)
us_1 = us_e[W:-W, W:-W]
vs_1 = vs_e[W:-W, W:-W]
print("win(full) vs whole predict:",
      float(jnp.abs(us_1 - us_w).max()), float(jnp.abs(vs_1 - vs_w).max()))

# tiled predict (reuse the internals by calling the step with a stub?)
# simpler: replicate the tile loop here at tile=(16, 64)
def tiled_predict(Tx, Ty):
    g = cfg.grid
    ntx, nty = g.nx // Tx, g.ny // Ty
    Ex, Ey = Tx + 2 * W + 2, Ty + 2 * W + 2
    acc_u, acc_v = jnp.zeros_like(u), jnp.zeros_like(v)
    for t in range(ntx * nty):
        ti, tj = divmod(t, nty)
        r0, c0 = ti * Tx, tj * Ty
        blocks = [jax.lax.dynamic_slice(a, (r0, c0), (Ex, Ey))
                  for a in pads]
        ue, ve = pallas_predict_win(cfg, *blocks, r0 - W, c0 - W,
                                    interpret=True)
        ku = ue[W:W + Tx + 2, W:W + Ty + 2]
        kv = ve[W:W + Tx + 2, W:W + Ty + 2]
        acc_u = jax.lax.dynamic_update_slice(acc_u, ku, (r0, c0))
        acc_v = jax.lax.dynamic_update_slice(acc_v, kv, (r0, c0))
    return acc_u, acc_v

for T in ((16, 64), (8, 8)):
    tu, tv_ = tiled_predict(*T)
    print(f"tiled{T} vs whole predict:",
          float(jnp.abs(tu - us_w).max()), float(jnp.abs(tv_ - vs_w).max()))
    d = np.abs(np.asarray(tu - us_w))
    if d.max() > 0:
        idx = np.unravel_index(d.argmax(), d.shape)
        print("  worst at", idx, "of", d.shape)
        rows = np.unique(np.nonzero(d > 1e-15)[0])
        print("  rows with diffs:", rows[:20])

# sweeps
Fs_w = pallas_fct_sweep_x(cfg, F, u, interpret=True)
pads2 = [jnp.pad(a, W) for a in (F, u)]
Fs_1 = pallas_fct_sweep_win(cfg, *pads2, 0, -W, -W, interpret=True)[W:-W, W:-W]
print("win(full) vs whole sweep_x:", float(jnp.abs(Fs_1 - Fs_w).max()))

def tiled_sweep(Tx, Ty, axis, A, V):
    g = cfg.grid
    ntx, nty = g.nx // Tx, g.ny // Ty
    Ex, Ey = Tx + 2 * W + 2, Ty + 2 * W + 2
    padsl = [jnp.pad(a, W) for a in (A, V)]
    acc = jnp.zeros_like(A)
    for t in range(ntx * nty):
        ti, tj = divmod(t, nty)
        r0, c0 = ti * Tx, tj * Ty
        blocks = [jax.lax.dynamic_slice(a, (r0, c0), (Ex, Ey))
                  for a in padsl]
        out = pallas_fct_sweep_win(cfg, blocks[0], blocks[1], axis,
                                   r0 - W, c0 - W, interpret=True)
        acc = jax.lax.dynamic_update_slice(
            acc, out[W:W + Tx + 2, W:W + Ty + 2], (r0, c0))
    return acc

for T in ((16, 64), (8, 8)):
    tx_ = tiled_sweep(*T, 0, F, u)
    print(f"tiled{T} vs whole sweep_x:", float(jnp.abs(tx_ - Fs_w).max()))

Fy_w = pallas_fct_sweep_y(cfg, F, v, interpret=True)
for T in ((16, 64), (8, 8)):
    ty_ = tiled_sweep(*T, 1, F, v)
    print(f"tiled{T} vs whole sweep_y:", float(jnp.abs(ty_ - Fy_w).max()))

# whole hybrid step vs XLA step vs tiled hybrid, 3 steps
want = state
whole = state
tiled = state
for k in range(1, 4):
    even = (k % 2 == 0)
    want = tv.step(cfg, want, even_step=even)
    whole = _step_pallas(cfg, whole, even_step=even, interpret=True)
    tiled = _step_pallas_hybrid_tiled(cfg, tiled, even_step=even, tile=(16, 64))
for n in ("F", "u", "v", "p"):
    dw = float(jnp.abs(getattr(whole, n) - getattr(want, n)).max())
    dt_ = float(jnp.abs(getattr(tiled, n) - getattr(want, n)).max())
    dwt = float(jnp.abs(getattr(tiled, n) - getattr(whole, n)).max())
    print(f"{n}: whole-vs-xla {dw:.2e}  tiled-vs-xla {dt_:.2e}  tiled-vs-whole {dwt:.2e}")
