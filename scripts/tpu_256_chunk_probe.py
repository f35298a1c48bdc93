"""Which slab-chunk B compiles at 256^3? (the B=8 predict kernel blew
VMEM: 97M estimated + 103M register spills = 165M > 128M). Probes each
kernel family at B in (8, 4, 2) by monkeypatching step3d._pick_chunk.
env B=4 KERN=predict,correct,sweep,full"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
import jax.numpy as jnp

import tpuvof.pallas_kernels.step3d as s3k
from tpuvof.grid import Grid3D
from tpuvof.solver3d import _pad_jk

B = int(os.environ.get("B", "4"))
KERNS = os.environ.get("KERN", "predict,correct,sweep").split(",")
N = int(os.environ.get("N", "256"))
s3k._pick_chunk = lambda nx: B if nx % B == 0 and nx // B >= 3 else None
print("backend:", jax.default_backend(), "B:", B, "N:", N, flush=True)

g = Grid3D(N, N, N)
p1, p2 = _pad_jk(g)
shape = (N + 2, N + 2 + p1, N + 2 + p2)
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(0, 1e-3, shape).astype(np.float32))
u, v, w, F = mk(), mk(), mk(), jnp.asarray(
    np.clip(rng.normal(0.5, 0.3, shape), 0, 1).astype(np.float32))
from tpuvof.config import Fluid
fl = Fluid()

if "predict" in KERNS:
    t0 = time.perf_counter()
    us, vs, ws, rhs = jax.jit(lambda u, v, w, F: s3k.pallas_predict3d_rhs(
        g, fl, 4e-6, u, v, w, F))(u, v, w, F)
    np.asarray(us[:1, :1, :8])
    print(f"predict B={B}: OK ({time.perf_counter()-t0:.1f}s), "
          f"finite={bool(jnp.isfinite(us).all())}", flush=True)
if "correct" in KERNS:
    t0 = time.perf_counter()
    uo, vo, wo = jax.jit(lambda us, vs, ws, p, F: s3k.pallas_correct3d(
        g, fl, 4e-6, us, vs, ws, p, F))(u, v, w, mk(), F)
    np.asarray(uo[:1, :1, :8])
    print(f"correct B={B}: OK ({time.perf_counter()-t0:.1f}s)", flush=True)
if "sweep" in KERNS:
    t0 = time.perf_counter()
    Fo = jax.jit(lambda F, u: s3k.pallas_fct3d_sweep(
        g, 4e-6, F, u, 0, mirror_out=True))(F, u)
    np.asarray(Fo[:1, :1, :8])
    print(f"sweep(x) B={B}: OK ({time.perf_counter()-t0:.1f}s)", flush=True)
print("PROBE DONE", flush=True)
