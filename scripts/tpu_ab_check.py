"""A/B: simulate_3d vs a hand-rolled scan of _step_3d_pallas_padded at
200^3 — the per-phase profile measured 122 ms/step while simulate_3d
measured 5.1 ms/step in the same hour; isolate which program is slow."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.config import Fluid
from tpuvof.solver3d import simulate_3d, _pad_jk, _step_3d_pallas_padded, _apply_bc_3d_win
from tpuvof.state import State3D

g = Grid3D(200, 200, 200)
fl = Fluid()
s = tv.init_state_3d(g, ic=1)

def t(fn, *a):
    t0 = time.perf_counter(); out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1, :8])
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1, :8])
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return c, best

c, b = t(lambda st: simulate_3d(g, st, 30, backend="pallas"), s)
print(f"simulate_3d 30 steps: compile {c:.1f}s best {b:.3f}s -> {b/30*1e3:.2f} ms/step", flush=True)

p1, p2 = _pad_jk(g)
pad = lambda a: jnp.pad(a, ((0, 0), (0, p1), (0, p2)))
sp = State3D(*(pad(a) for a in s))

@jax.jit
def scan30(s5):
    st = State3D(*s5)
    def body(st, _):
        for ph in (1, 2, 0):
            st = _step_3d_pallas_padded(g, fl, 4e-6, 10, st, ph)
        return st, None
    st, _ = jax.lax.scan(body, st, None, length=10)
    return tuple(st)

c, b = t(scan30, tuple(sp))
print(f"hand scan30 (tuple arg): compile {c:.1f}s best {b:.3f}s -> {b/30*1e3:.2f} ms/step", flush=True)
