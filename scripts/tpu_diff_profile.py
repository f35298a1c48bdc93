"""Where does the differentiable epoch's 0.153 s go? (VERDICT r1 #8)

Splits the 80^2 x 999-step epoch into:
  - forward-only rollout (value, no grad)
  - value_and_grad (the epoch's real cost)
  - forward rollout without remat (upper bound on what a faster forward
    could save inside value_and_grad's primal pass)
and compares the XLA step against a hypothetical zero-cost forward to bound
the achievable speedup from a Pallas-forward custom_vjp.

At 82^2 every field is 27 KB — the whole state fits in one VMEM tile, so
the XLA step is launch/latency-bound, not bandwidth-bound; this script
provides the profiler evidence BASELINE.md cites.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpuvof import diff

print("backend:", jax.default_backend(), flush=True)

cfg = diff.diff_config(80)
Ft = diff.diff_target(cfg, 2)
F0 = diff.diff_target(cfg, 1) * 0.5
N_STEPS = 999


@jax.jit
def fwd_only(F0):
    return diff.rollout(cfg, F0, N_STEPS, remat=True).F


@jax.jit
def fwd_noremat(F0):
    return diff.rollout(cfg, F0, N_STEPS, remat=False).F


def timeit(name, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:32s}: {best*1e3:8.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return best


t_fwd = timeit("forward rollout (remat)", fwd_only, F0)
t_fwd_nr = timeit("forward rollout (no remat)", fwd_noremat, F0)
t_vag = timeit("value_and_grad epoch", lambda F0: diff.loss_and_grad(
    cfg, F0, Ft, N_STEPS, True), F0)

print(f"\nepoch {t_vag*1e3:.1f} ms = primal fwd ~{t_fwd*1e3:.1f} ms "
      f"+ bwd(recompute+adjoint) ~{(t_vag - t_fwd)*1e3:.1f} ms", flush=True)
print(f"per fwd step: {t_fwd/N_STEPS*1e6:.1f} us "
      f"({82*82*4*4/2**10:.0f} KiB state)", flush=True)
print(f"zero-cost-forward bound on a Pallas-forward custom_vjp: "
      f"{t_vag/(t_vag - t_fwd):.2f}x", flush=True)
