"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set platform flags before the first jax import anywhere in the test
process.
"""

import os
import sys

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (the real TPU
# tunnel), which would make every eager op a network round trip.  Tests run
# on a virtual 8-device CPU mesh; the benchmark uses the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's fusion emitter contracts f32 mul+add chains into FMAs (it
# compiles with allow-excess-precision), which diverges from the reference
# decoder's strictly-rounded arithmetic by 1 ulp — enough to flip the
# IDCT's trunc() rounding.  Disabling the fusion pass restores strict
# rounding so CPU tests validate reference semantics.  The TPU backend is
# verified separately on hardware (see bench.py FMA regression).
if "xla_disable_hlo_passes" not in _flags:
    _flags = (_flags + " --xla_disable_hlo_passes=fusion").strip()
os.environ["XLA_FLAGS"] = _flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; pin the
# platform through jax.config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
