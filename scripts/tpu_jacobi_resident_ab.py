"""A/B the round-5 single-volume resident Jacobi against the round-4 forms.

The round-5 kernel change (jacobi3d._kernel: p streamed from HBM through
the rhs staging instead of a VMEM in-spec) halved the kernel's true VMEM
footprint — Mosaic allocates input AND output windows for VMEM specs, so
the old form cost 2x vol — and the corrected _vmem_need model then
admits:
  - B=8 chunks at 200^3 (round 4 ran B=4),
  - the RESIDENT kernel at 256^3 (round 4 streamed p through VMEM
    out-of-place per iteration: ~3 volumes of HBM traffic per iteration
    vs the resident kernel's ~3 total).

Each leg runs in its OWN PROCESS (driver mode, no argv): monkeypatched
legs must not inherit the jit cache of the default-config leg (the first
version of this script did exactly that — all four legs timed the same
program), and jax.clear_caches() inside one process wedged the axon
backend's remote compile for >30 min. Cross-process compile caching
keeps the repeat legs cheap; the trailing 200^3 re-run is the env-drift
check that replaces strict same-process timing (CLAUDE.md rules).

  A  200^3 x100 pallas, new default (resident B=8)
  B  200^3 x100, _pick_chunk forced to 4 (round-4 form)
  C  256^3 x100 pallas, new default (resident B=8)
  D  256^3 x100, forced streamed (round-4 form)
  A' 200^3 re-run (env drift)
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LEGS = [
    ("A  200^3 B=8 resident", "200", "default"),
    ("B  200^3 B=4 resident", "200", "b4"),
    ("C  256^3 resident", "256", "default"),
    ("D  256^3 streamed", "256", "streamed"),
    ("A' 200^3 B=8 re-run", "200", "default"),
]


def leg_main(n, mode):
    import numpy as np
    import jax

    from tpuvof.grid import Grid3D
    from tpuvof.pallas_kernels import jacobi3d as j3d
    from tpuvof.solver3d import init_state_3d, simulate_3d

    if mode == "b4":
        j3d._pick_chunk = lambda nx, g=None, nloc=None, plane=None: 4
    elif mode == "streamed":
        j3d.jacobi3d_fits_vmem = lambda g: False

    STEPS = 100
    g = Grid3D(int(n), int(n), int(n))
    state = init_state_3d(g, ic=1)

    def run(s):
        t0 = time.perf_counter()
        out = simulate_3d(g, s, STEPS, backend="pallas")
        np.asarray(out.F[:1, :1, :8])
        return time.perf_counter() - t0, out

    t0 = time.perf_counter()
    run(state)  # warmup / compile
    warm = time.perf_counter() - t0
    best = min(run(state)[0] for _ in range(3))
    cups = g.nx * g.ny * g.nz * STEPS / best
    print(f"RESULT {best:.4f} s/{STEPS} steps = {cups/1e9:.3f}e9 CUPS "
          f"(compile+warm {warm:.1f} s, backend {jax.default_backend()})",
          flush=True)


if __name__ == "__main__" and len(sys.argv) > 1:
    leg_main(sys.argv[1], sys.argv[2])
    sys.exit(0)

if __name__ == "__main__":
    for label, n, mode in LEGS:
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), n, mode],
            capture_output=True, text=True, timeout=3600)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line is None:
            print(f"[{label}] FAILED:\n{r.stdout[-2000:]}\n"
                  f"{r.stderr[-2000:]}", flush=True)
            sys.exit(1)
        print(f"[{label}] {line[7:]}  (leg wall "
              f"{time.perf_counter()-t0:.0f} s)", flush=True)
