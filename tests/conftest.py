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
# persistent compile cache: the fused-physics step is a large graph
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
