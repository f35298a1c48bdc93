"""The HBM-streamed out-of-place Jacobi (VERDICT r3 #4) and its routing.

Beyond ~232^3 the VMEM-resident Jacobi volume no longer fits and round 3
dropped the whole step to XLA. Round 4 keeps the slab kernels (their
per-chunk working set fits far beyond that) and swaps only the solve for
`streamed_jacobi_3d`. Real beyond-envelope grids are untestable on CPU,
so the routing tests force the streamed path on small grids by
monkeypatching `jacobi3d_fits_vmem`; the TPU-scale A/B lives in
scripts/tpu_streamed256.py and the measured numbers in BASELINE.md.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.pallas_kernels import jacobi3d
from tpuvof.pallas_kernels.jacobi3d import (
    pallas_jacobi_3d,
    streamed_jacobi_3d,
)
from tpuvof.solver3d import _pad_jk, init_state_3d, simulate_3d


def _rand_fields(n, seed=0):
    g = Grid3D(n, n, n)
    p1, p2 = _pad_jk(g)
    rng = np.random.default_rng(seed)
    shape = (g.nx + 2, g.ny + 2 + p1, g.nz + 2 + p2)
    p = jnp.asarray(rng.normal(size=shape))
    rhs = np.zeros(shape)
    rhs[1:n + 1, 1:n + 1, 1:n + 1] = rng.normal(size=(n, n, n))
    return g, p, jnp.asarray(rhs)


@pytest.mark.parametrize("n", [8, 16, 22])
def test_streamed_matches_resident(n):
    """Same update rule as the resident kernel: 10 f64 iterations agree to
    1 ulp across nc = 1, 2, and a non-multiple-of-8 plane count."""
    g, p, rhs = _rand_fields(n, seed=n)
    a = pallas_jacobi_3d(g, 10, p, rhs, interpret=True)
    b = streamed_jacobi_3d(g, 10, p, rhs, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-15)
    # zeroed ghost ring, exactly like the resident kernel's contract
    bb = np.asarray(b)
    assert np.abs(bb[0]).max() == 0.0 and np.abs(bb[-1]).max() == 0.0
    assert np.abs(bb[:, 0]).max() == 0.0
    assert np.abs(bb[:, g.ny + 1:]).max() == 0.0
    assert np.abs(bb[:, :, 0]).max() == 0.0
    assert np.abs(bb[:, :, g.nz + 1:]).max() == 0.0


def test_streamed_routing_beyond_envelope(monkeypatch):
    """When the resident Jacobi volume does not fit VMEM but the slab
    kernels still run, simulate_3d(backend='pallas') keeps the slab step
    and hosts the streamed solve — and the trajectory matches XLA at f64
    (the round-3 behavior was a whole-step XLA fallback)."""
    import tpuvof.solver3d as s3d

    calls = {"n": 0}
    real = jacobi3d.streamed_jacobi_3d

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(jacobi3d, "jacobi3d_fits_vmem", lambda g: False)
    monkeypatch.setattr(jacobi3d, "streamed_jacobi_3d", counting)

    n = 16
    g = Grid3D(n, n, n)
    state = init_state_3d(g, ic=1)
    state = tv.State3D(*(jnp.asarray(np.asarray(a), jnp.float64)
                         for a in state))
    assert s3d.pallas3d_supported(g)
    want = simulate_3d(g, state, 4, backend="xla")
    got = simulate_3d(g, state, 4, backend="pallas")
    assert calls["n"] > 0, "streamed solve was never routed"
    for name, atol in (("F", 1e-12), ("u", 1e-12), ("v", 1e-12),
                       ("w", 1e-12), ("p", 1e-8)):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name))[1:-1, 1:-1, 1:-1],
            np.asarray(getattr(want, name))[1:-1, 1:-1, 1:-1],
            atol=atol, err_msg=name)
