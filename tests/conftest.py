"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's CI strategy (plain `cargo test` on ubuntu,
rust.yml:23-24): the same deterministic fixtures run under jit on the CPU
backend; multi-device behavior is tested without a pod via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).
"""

import os

# Must run before the first backend initialization in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments (e.g. remote-TPU sitecustomize hooks) override
# jax_platforms at interpreter start; force CPU via config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
