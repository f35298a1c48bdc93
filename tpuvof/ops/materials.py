"""Material property mixing (reference `cal_nu_rho`, 2dvof.py:198-203).

Pointwise over the full grid including ghosts: the VOF fraction is clamped to
[0, 1] (the reference's median trick) and then density/viscosity are linear
mixes of the liquid/gas properties. Works for 2-D and 3-D arrays alike.
"""
from __future__ import annotations

from ..config import Fluid
from .common import clamp01

__all__ = ["mix_properties"]


def mix_properties(fl: Fluid, F):
    """Return (rho, nu) arrays from the volume fraction."""
    Fc = clamp01(F)
    rho = fl.rho_g * (1.0 - Fc) + fl.rho_l * Fc
    nu = fl.nu_l * Fc + fl.nu_g * (1.0 - Fc)
    return rho, nu
