"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip sharding (tpuvof.parallel) is exercised on a host-platform mesh
per SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8.
The environment's sitecustomize registers the axon TPU platform and pins
JAX_PLATFORMS=axon, so the platform must also be forced back to cpu via
jax.config after import. float64 is enabled so golden trajectory comparisons
against the NumPy reference spec are not drowned in f32 rounding noise (ops
follow the dtype of their inputs; production runs stay float32).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
