"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests at all (SURVEY.md §4); this suite is
designed from scratch: golden parity tests against torch oracles (the torch
CPU build is available) + distributed tests on a fake mesh, which needs no TPU
pod.

The shell presets JAX_PLATFORMS=axon (the real TPU); tests override to CPU via
jax.config BEFORE backend initialisation, plus 8 fake host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
