"""Numerical ops (layer L2): pure array functions, one per physics kernel.

Maps one-to-one onto the reference kernel inventory (SURVEY.md §2.3):
materials.mix_properties      <- cal_nu_rho        (2dvof.py:198)
bc.apply_bc                   <- set_BC            (2dvof.py:162)
normals.young_normals_curvature <- get_normal_young (2dvof.py:283)
momentum.predict_velocity     <- advect_upwind     (2dvof.py:206)
momentum.update_velocity      <- update_uv         (2dvof.py:269)
poisson.solve_pressure        <- solve_p_jacobi    (2dvof.py:236)
fct.rudman_advect             <- solve_VOF_rudman + fct_{x,y}_sweep (2dvof.py:312-448)
common.clamp01                <- var / post_process_f (2dvof.py:192,452)
"""
from .common import clamp01, median3, win, interior, set_interior
from .materials import mix_properties
from .bc import apply_bc, apply_bc_3d, mirror_scalar
from .normals import young_normals_curvature
from .momentum import predict_velocity, update_velocity
from .poisson import solve_pressure, divergence_rhs, poisson_coefficients
from .fct import fct_sweep_x, fct_sweep_y, rudman_advect
