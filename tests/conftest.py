"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's CI strategy (plain `cargo test` on ubuntu,
rust.yml:23-24): the same deterministic fixtures run under jit on the CPU
backend; multi-device behavior is tested without a pod via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).
"""

import os

# Must run before the first jax import anywhere in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
