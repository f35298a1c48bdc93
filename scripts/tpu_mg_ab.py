"""A/B: residual-driven pressure solvers — RB-SOR vs geometric multigrid.

Times COLD-START solves (p0 = 0) of the projected pure-Neumann system to a
relative residual of 1e-5, on rhs fields taken from a developed dam-break
flow (representative spectrum, not white noise). Timing per CLAUDE.md: K
solves of slightly-perturbed rhs inside ONE jitted `lax.scan` (per-call
dispatch over the axon tunnel pays a ~28 ms floor; the perturbation keeps
XLA from hoisting a loop-invariant solve), warm first, best-of-3.

This is the measurement behind BASELINE.md's 'mg' section: RB-SOR's sweep
count grows O(n) with grid size while MG's V-cycle count is O(1), so the
gap must widen with n. The 10-sweep fixed-Jacobi reference path is timed
alongside for scale (it does NOT reach the tolerance — it is the
reference-parity baseline, 2dvof.py:521-522).

Usage (on the TPU machine):  python scripts/tpu_mg_ab.py
  env N2D="512,1024,2048"  N3D="128"  K=8  REL=1e-5  SOLVERS=jacobi10,rbsor,mg

The rbsor cells use K_RBSOR (default 2) scanned solves instead of K: a
tight-tol 512^2+ RB-SOR runs thousands of sweeps per solve, and an 8-solve
scan once exceeded the tunnel worker's patience (worker crash, round 4).
Run grids/solvers in separate invocations (SOLVERS/N2D/N3D) so one bad
cell cannot take down the sweep.

`rbsor_opt` is rbsor at the textbook optimal omega 2/(1+sin(pi/n)) instead
of the config default 1.7 — measured here to decide whether Numerics
should auto-pick omega.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import tpuvof as tv
from tpuvof.grid import Grid2D, Grid3D
from tpuvof.ops.materials import mix_properties
from tpuvof.ops.mg import mg_levels, mg_solve
from tpuvof.ops.poisson import _rbsor, _jacobi_sweeps, divergence_rhs, residual

print("backend:", jax.default_backend(), flush=True)

K = int(os.environ.get("K", "8"))
K_RBSOR = int(os.environ.get("K_RBSOR", "2"))
REL = float(os.environ.get("REL", "1e-5"))
N2D = tuple(int(s) for s in os.environ.get("N2D", "512,1024,2048").split(",")
            if s)
N3D = tuple(int(s) for s in os.environ.get("N3D", "128").split(",") if s)
SOLVERS = tuple(os.environ.get(
    "SOLVERS", "jacobi10,rbsor,rbsor_opt,mg").split(","))


def timed(fn, *args):
    fn(*args)  # warm / compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1, :8] if out.ndim == 2 else out[:1, :1, :8])
        best = min(best, time.perf_counter() - t0)
    return best


def rhs_2d(n):
    """Developed-flow rhs: 300 steps of the dam break, then rho/dt*div(u)."""
    cfg = tv.SimConfig(grid=Grid2D(n, n))
    s = tv.simulate(cfg, tv.init_state(cfg, ic=1), 300)
    rho, _ = mix_properties(cfg.fluid, s.F)
    rhs = divergence_rhs(cfg.grid, cfg.num, s.u, s.v, rho)
    return cfg.grid, rhs - jnp.mean(rhs)


def rhs_3d(n):
    from tpuvof.solver3d import _rhs_3d, init_state_3d, simulate_3d

    g = Grid3D(n, n, n)
    s = simulate_3d(g, init_state_3d(g, ic=1), 100,
                    backend="pallas" if jax.default_backend() != "cpu"
                    else "xla")
    rho, _ = mix_properties(tv.Fluid(), s.F)
    rhs = _rhs_3d(g, 4e-6, s.u, s.v, s.w, rho)
    return g, rhs - jnp.mean(rhs)


def bench(name, g, rhs, inv2, p_shape):
    r0 = float(residual(g, jnp.zeros(p_shape, rhs.dtype), rhs)) if len(
        p_shape) == 2 else None
    if r0 is None:  # 3-D residual via the solver's own measure
        from tpuvof.solver3d import _poisson_coeffs_3d, _neigh_3d

        coeffs = _poisson_coeffs_3d(g, rhs.dtype)
        p0 = jnp.zeros(p_shape, rhs.dtype)
        r = _neigh_3d(g, coeffs, p0, rhs) - (1.0 / coeffs[-1]) * p0[
            (slice(1, -1),) * 3]
        r0 = float(jnp.max(jnp.abs(r - jnp.mean(r))))
    tol = REL * r0

    def rhs_of(k):
        # k slightly-perturbed copies so the scanned solve is not
        # loop-invariant
        fac = (1.0 + 1e-4 * jnp.arange(k, dtype=rhs.dtype)).reshape(
            (k,) + (1,) * rhs.ndim)
        return rhs[None] * fac

    def scan_of(solver):
        @jax.jit
        def run(rhs_k):
            def body(carry, rhs_i):
                p = solver(jnp.zeros(p_shape, rhs.dtype), rhs_i)
                return carry + p[(slice(1, -1),) * rhs.ndim].mean(), None

            acc, _ = lax.scan(body, jnp.zeros((), rhs.dtype), rhs_k)
            return acc.reshape(1, 1) * jnp.ones((1, 8), rhs.dtype)

        return run

    n_max = max(rhs.shape)
    om_opt = 2.0 / (1.0 + np.sin(np.pi / n_max))
    if rhs.ndim == 2:
        def nm_sor(om):
            return tv.Numerics(pressure_solver="rbsor", sor_tol=tol,
                               sor_omega=float(om), sor_max_iter=200_000)

        solvers = {
            "jacobi10": lambda p, r: _jacobi_sweeps(g, 10, p, r),
            "rbsor": lambda p, r: _rbsor(g, nm_sor(1.7), p, r),
            "rbsor_opt": lambda p, r: _rbsor(g, nm_sor(om_opt), p, r),
            "mg": lambda p, r: mg_solve(p, r, inv2, tol, 1000),
        }
    else:
        from tpuvof.solver3d import _rbsor_3d

        solvers = {
            "rbsor": lambda p, r: _rbsor_3d(g, p, r, 1.7, tol, 200_000),
            "rbsor_opt": lambda p, r: _rbsor_3d(g, p, r, om_opt, tol,
                                                200_000),
            "mg": lambda p, r: mg_solve(p, r, inv2, tol, 1000),
        }
    print(f"\n== {name}: r0={r0:.3e}, tol={tol:.3e} (rel {REL}), "
          f"omega_opt={om_opt:.4f}, levels {mg_levels(rhs.shape)}",
          flush=True)
    out = {}
    for sname, solver in solvers.items():
        if sname not in SOLVERS:
            continue
        k = K_RBSOR if sname.startswith("rbsor") else K
        t = timed(scan_of(solver), rhs_of(k)) / k
        # verify the solve actually reached tol (single un-scanned call)
        p = jax.jit(solver)(jnp.zeros(p_shape, rhs.dtype), rhs)
        if rhs.ndim == 2:
            rr = float(residual(g, p, rhs))
        else:
            from tpuvof.solver3d import _poisson_coeffs_3d, _neigh_3d

            coeffs = _poisson_coeffs_3d(g, rhs.dtype)
            r = _neigh_3d(g, coeffs, p, rhs) - (1.0 / coeffs[-1]) * p[
                (slice(1, -1),) * 3]
            rr = float(jnp.max(jnp.abs(r - jnp.mean(r))))
        hit = "reached" if rr <= tol * 1.01 else f"MISSED (r={rr:.2e})"
        print(f"  {sname:9s} {t*1e3:9.3f} ms/solve   [{hit}]", flush=True)
        out[sname] = t
    if "rbsor" in out and "mg" in out:
        print(f"  -> mg speedup over rbsor: {out['rbsor']/out['mg']:.1f}x",
              flush=True)


for n in N2D:
    g, rhs = rhs_2d(n)
    bench(f"2-D {n}^2", g, rhs, (g.dxi**2, g.dyi**2), (n + 2, n + 2))

for n in N3D:
    g, rhs = rhs_3d(n)
    bench(f"3-D {n}^3", g, rhs, (g.dxi**2, g.dyi**2, g.dzi**2),
          (n + 2, n + 2, n + 2))
