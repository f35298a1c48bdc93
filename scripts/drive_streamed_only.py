import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
import jax.numpy as jnp
from tpuvof.grid import Grid3D
from tpuvof.pallas_kernels.jacobi3d import pallas_jacobi_3d, streamed_jacobi_3d
from tpuvof.solver3d import _pad_jk

print("backend:", jax.default_backend(), flush=True)
g = Grid3D(64, 64, 64)
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
print("STREAMED-ONCHIP-OK", flush=True)
