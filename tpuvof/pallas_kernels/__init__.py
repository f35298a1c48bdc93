"""Pallas TPU kernels for the hot phases (layer L0).

The XLA path already fuses pointwise work into the stencil passes, but each
logical phase still round-trips HBM, and the 10 Jacobi iterations are 10
full-field round trips. These kernels keep a phase's entire working set
VMEM-resident:

  - project: rho + rhs assembly + N Jacobi iterations + velocity
    correction in ONE kernel (1 HBM read of {F, u*, v*, p, u, v}, 1 write
    of {p, u, v} instead of ~36 field transfers),
  - fct_sweep: a full 4-pass Rudman/Zalesak sweep in one kernel,
  - predict: materials + Youngs normals + curvature + momentum predictor
    in one kernel.

Kernel bodies *call the same jnp op functions as the XLA path* — Mosaic
traces them into the kernel — so numerical parity with the reference
semantics is inherited, not re-derived; tests assert bitwise equality
against the XLA path (interpret mode on CPU, compiled on TPU).

Sized for whole-field VMEM residency (fields up to ~1024^2 f32); larger
grids fall back to the XLA path automatically.
"""
from .step_kernels import (
    pallas_available,
    project_pressure_and_correct,
    pallas_fct_sweep_x,
    pallas_fct_sweep_y,
    pallas_predict,
    pallas_fullstep,
)

__all__ = [
    "pallas_available",
    "project_pressure_and_correct",
    "pallas_fct_sweep_x",
    "pallas_fct_sweep_y",
    "pallas_predict",
    "pallas_fullstep",
]
