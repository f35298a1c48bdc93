import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax
import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.solver3d import simulate_3d

print("backend:", jax.default_backend(), flush=True)

# 1) hybrid 2-D: pallas + rbsor at 128^2, 200 steps
cfg = tv.SimConfig(grid=tv.Grid2D(128, 128),
                   num=tv.Numerics(backend="pallas", pressure_solver="rbsor"))
s = tv.init_state(cfg, ic=1)
t0 = time.perf_counter()
s = tv.simulate(cfg, s, 200)
F = np.asarray(s.F)
print(f"2d hybrid rbsor 128^2 x200: {time.perf_counter()-t0:.1f}s "
      f"finite={np.isfinite(F).all()} bounds=({F.min():.3f},{F.max():.3f}) "
      f"mass={F[1:-1,1:-1].sum():.4f}", flush=True)
assert np.isfinite(F).all() and F.min() >= 0 and F.max() <= 1

# 2) 3-D csf pallas at 64^3, 60 steps (fresh Mosaic compile of csf predict)
g = Grid3D(64, 64, 64)
s3 = tv.init_state_3d(g, ic=1)
t0 = time.perf_counter()
s3 = simulate_3d(g, s3, 60, backend="pallas", csf=True)
F3 = np.asarray(s3.F)
print(f"3d csf pallas 64^3 x60: {time.perf_counter()-t0:.1f}s "
      f"finite={np.isfinite(F3).all()} bounds=({F3.min():.3f},{F3.max():.3f})",
      flush=True)
assert np.isfinite(F3).all() and F3.min() >= 0 and F3.max() <= 1

# 3) 3-D hybrid rbsor pallas at 64^3, 30 steps
s3 = tv.init_state_3d(g, ic=1)
t0 = time.perf_counter()
s3 = simulate_3d(g, s3, 30, backend="pallas", pressure_solver="rbsor")
F3 = np.asarray(s3.F)
print(f"3d hybrid rbsor 64^3 x30: {time.perf_counter()-t0:.1f}s "
      f"finite={np.isfinite(F3).all()}", flush=True)
assert np.isfinite(F3).all()

# 4) streamed Jacobi solve correctness on-chip at 64^3 (compiled, not interpret)
import jax.numpy as jnp
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d, streamed_jacobi_3d
from tpuvof.solver3d import _pad_jk
p1, p2 = _pad_jk(g)
rng = np.random.default_rng(0)
shape = (g.nx + 2, g.ny + 2 + p1, g.nz + 2 + p2)
p = jnp.asarray(rng.normal(size=shape).astype(np.float32))
rhs = np.zeros(shape, np.float32)
rhs[1:65, 1:65, 1:65] = rng.normal(size=(64, 64, 64))
rhs = jnp.asarray(rhs)
a = np.asarray(jax.jit(lambda p, r: pallas_jacobi_3d(g, 10, p, r))(p, rhs))
b = np.asarray(jax.jit(lambda p, r: streamed_jacobi_3d(g, 10, p, r))(p, rhs))
print("streamed vs resident on-chip max|diff|:", np.abs(a - b).max(), flush=True)
assert np.abs(a - b).max() < 1e-5
print("ALL NEW-SURFACE DRIVES OK", flush=True)
