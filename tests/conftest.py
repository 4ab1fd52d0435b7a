"""Test harness config: run the suite on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count=8 (the TPU-world replacement for a fake
backend — SURVEY.md 4f). Must run before jax initializes.
"""

import os

# NOTE: the environment presets JAX_PLATFORMS=axon (the TPU tunnel), and the
# env var is not reliably re-read at import time — force via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
