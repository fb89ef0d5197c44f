"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a host-platform mesh instead (SURVEY.md §4 "distributed tests").

The ambient environment registers a remote-TPU ("axon") PJRT backend from
sitecustomize and pins it programmatically, so setting JAX_PLATFORMS in the
environment is not enough — we must override via jax.config after import.
CPU also keeps fp32 parity tolerances meaningful (the TPU MXU uses bf16
accumulation by default).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
