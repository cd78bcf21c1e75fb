"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by the driver's bench/compile checks; unit
tests run on CPU with 8 virtual devices so multi-chip sharding paths are
testable without hardware (SURVEY.md §2e / task spec).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
