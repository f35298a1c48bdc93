"""End-to-end TPU drive for /verify: 2-D 512^2 happy path + 3-D 200^3 pallas
pipeline; asserts finiteness/bounds/mass and prints steady-state CUPS."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax
import tpuvof as tv
from tpuvof.grid import Grid3D
from tpuvof.solver3d import simulate_3d
print("devices:", jax.devices(), flush=True)

# 2-D happy path (512^2, 1000 steps)
cfg = tv.dam_break_2d(512)
s = tv.init_state(cfg, ic=1)
t0 = time.perf_counter()
s = tv.simulate(cfg, s, 1000)
F = np.asarray(s.F)
print(f"2-D 512^2 x1000: {time.perf_counter()-t0:.2f}s (incl compile)", flush=True)
mass = F[1:-1,1:-1].sum()
print(f"  finite={np.isfinite(F).all()} bounds=({F.min():.3e},{F.max():.3e}) mass={mass:.2f}", flush=True)
assert np.isfinite(F).all() and F.min() >= -1e-6 and F.max() <= 1 + 1e-6

# 3-D pallas full pipeline at the reference's flagship 200^3
g = Grid3D(200, 200, 200)
s3 = tv.init_state_3d(g, ic=1)
t0 = time.perf_counter()
out = simulate_3d(g, s3, 100, backend="pallas")
np.asarray(out.F[:1,:1,:8])
print(f"3-D 200^3 x100 pallas: {time.perf_counter()-t0:.2f}s (incl compile)", flush=True)
# istep0 continues the reference's istep % 3 rotation across chunks; each
# residue (istep0 % 3) is its own compiled program, so warm residues 1
# and 2 before timing a residue-0 chunk (a compile inside the timed
# region once read as a 50x "regression")
out = simulate_3d(g, out, 100, backend="pallas", istep0=100)
out = simulate_3d(g, out, 100, backend="pallas", istep0=200)
np.asarray(out.F[:1,:1,:8])
t0 = time.perf_counter()
out = simulate_3d(g, out, 100, backend="pallas", istep0=300)
np.asarray(out.F[:1,:1,:8])
dt = time.perf_counter()-t0
F3 = np.asarray(out.F)
m3 = F3[1:-1,1:-1,1:-1].sum()
print(f"  steady: {dt:.3f}s -> {200**3*100/dt/1e9:.3f}e9 CUPS", flush=True)
print(f"  finite={np.isfinite(F3).all()} bounds=({F3.min():.3e},{F3.max():.3e}) mass={m3:.1f} (init 16000*... )", flush=True)
assert np.isfinite(F3).all()
s3i = tv.init_state_3d(g, ic=1)
mi = np.asarray(s3i.F)[1:-1,1:-1,1:-1].sum()
print(f"  mass drift vs init: {abs(m3-mi)/mi:.2e}", flush=True)
print("VERIFY-OK", flush=True)

# TPU-side 1000-step golden drift (VERDICT r1 #2, last clause): the f32
# production dtype on REAL TPU hardware vs the f64 loop-spec oracle.
# CPU-measured drift is 1.06e-3 (chaos-amplified dtype gap, not framework
# error — see tests/test_golden.py); bound it at the same 5x margin here.
golden = np.load(os.path.join(os.path.dirname(__file__), "..",
                              "tests", "golden_dambreak_64_1000.npz"))
n = int(golden["n"])
import jax.numpy as jnp
cfg_g = tv.SimConfig(grid=tv.Grid2D(n, n))
sg = tv.init_state(cfg_g, ic=1)
sg = tv.State(*(jnp.asarray(x, jnp.float32) for x in sg))
sg = tv.simulate(cfg_g, sg, int(golden["n_steps"]))
drift = np.max(np.abs(np.asarray(sg.F, np.float64) - golden["F"]))
print(f"TPU f32 1000-step golden drift: {drift:.3e} (bound 5e-3)", flush=True)
assert drift <= 5e-3, drift
print("GOLDEN-TPU-OK", flush=True)
