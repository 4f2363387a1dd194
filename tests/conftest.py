"""Test harness: force an 8-virtual-device CPU mesh so sharding/collective
tests run without TPU hardware (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# the sandbox sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel); tests must
# run on CPU, and the env var is stomped, so use the in-process config.
jax.config.update("jax_platforms", "cpu")
