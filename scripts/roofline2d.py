"""2-D mono-kernel roofline (VERDICT r2 #7).

Counts the arithmetic of ONE lean 2-D step at 512^2 via XLA's own cost
analysis of the xla-backend step (the mono Pallas kernel computes the
identical math — tests/test_pallas.py pins the trajectories), derives
flops/cell-step and HBM bytes/cell-step, and prints the implied VPU
utilization for the measured TPU step time.

Run on CPU (flop counting only): python scripts/roofline2d.py [ms_per_step]
Pass the measured mono step time in ms (default: BASELINE.md's 512^2
number). The VPU peak model is stated explicitly below.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import tpuvof as tv
from tpuvof.solver import step


def main():
    ms = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0976
    n = 512
    cfg = tv.SimConfig(grid=tv.Grid2D(n, n))
    s = tv.init_state(cfg, ic=1)

    fn = jax.jit(lambda st: step(cfg, st, even_step=True, lean=True))
    ca = fn.lower(s).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    trans = float(ca.get("transcendentals", 0.0))
    cells = n * n
    f_cell = flops / cells

    # HBM traffic of the mono kernel: 4 fields in + 4 out, f32, padded
    # (n+2 -> (8,128) tiles); everything else is VMEM-resident.
    pad_i = -(-(n + 2) // 8) * 8
    pad_j = -(-(n + 2) // 128) * 128
    bytes_step = 8 * pad_i * pad_j * 4
    b_cell = bytes_step / cells

    achieved_flops = flops / (ms * 1e-3)
    achieved_bw = bytes_step / (ms * 1e-3)

    # v5e VPU peak model: (8,128) vector unit, 4 ALUs/lane, ~940 MHz,
    # FMA = 2 flops -> 8*128*4*2*0.94e9 = 7.70e12 f32 flops/s.
    vpu_peak = 8 * 128 * 4 * 2 * 0.94e9
    hbm_peak = 819e9

    print(f"flops/step (XLA cost analysis, lean step, {n}^2): {flops:.3e}")
    print(f"transcendentals/step: {trans:.3e}")
    print(f"flops/cell-step: {f_cell:.1f}")
    print(f"HBM bytes/step (4 in + 4 out, padded f32): {bytes_step:.3e}"
          f"  -> {b_cell:.1f} B/cell-step")
    print(f"arithmetic intensity: {flops / bytes_step:.1f} flop/B"
          f"  (VPU ridge at {vpu_peak / hbm_peak:.1f})")
    print(f"measured step: {ms:.4f} ms  ->  {cells / (ms * 1e-3) / 1e9:.2f}e9 CUPS")
    print(f"achieved: {achieved_flops / 1e12:.2f} Tflop/s"
          f" = {100 * achieved_flops / vpu_peak:.0f}% of VPU peak"
          f" ({vpu_peak / 1e12:.2f} T, FMA-counting model)")
    print(f"         {achieved_bw / 1e9:.0f} GB/s HBM"
          f" = {100 * achieved_bw / hbm_peak:.0f}% of {hbm_peak / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
