"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by the driver's bench/compile checks; unit
tests run on CPU with 8 virtual devices so multi-chip sharding paths are
testable without hardware (SURVEY.md §2e / task spec).

The axon sitecustomize pins ``jax_platforms='axon,cpu'`` at interpreter
start, so env vars alone don't stick — force the config programmatically
before any backend initializes.
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
