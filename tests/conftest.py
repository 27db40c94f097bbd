"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware, and Pallas kernels run in interpret mode
(msgs.kernels.composite switches on jax.default_backend()).

The terminal environment registers an `axon` TPU-tunnel backend via
sitecustomize and pins jax_platforms="axon,cpu" — tests must run locally, so
we re-pin to cpu before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
