"""Device-mesh construction helpers."""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "factor2d"]


def factor2d(n: int) -> tuple[int, int]:
    """Most-square factorization of n (px >= py)."""
    py = int(math.isqrt(n))
    while n % py:
        py -= 1
    return n // py, py


def make_mesh(n_devices: int | None = None, axis_names=("mx", "my")) -> Mesh:
    """A 2-D mesh over the first n_devices devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    px, py = factor2d(n)
    return Mesh(np.array(devs[:n]).reshape(px, py), axis_names)
