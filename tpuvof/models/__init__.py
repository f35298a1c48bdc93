"""Canonical problem setups ("model zoo").

Forward two-phase cases (reference 2dvof.py -ic {1,2,3}) and the pure
advection scheme-verification cases from test/forward_fct.py — including the
fixtures the reference keeps as commented-out code (translation, Zalesak
slotted disk, checkerboard): here they are first-class, tested cases.
"""
from .cases import dam_break, rising_bubble, liquid_drop, FORWARD_CASES
from .advection import (
    AdvectionCase,
    single_vortex,
    zalesak_disk,
    translation,
    checkerboard,
    simulate_advection,
    ADVECTION_CASES,
)

__all__ = [
    "dam_break",
    "rising_bubble",
    "liquid_drop",
    "FORWARD_CASES",
    "AdvectionCase",
    "single_vortex",
    "zalesak_disk",
    "translation",
    "checkerboard",
    "simulate_advection",
    "ADVECTION_CASES",
]
