"""Multi-host SPMD orchestration.

The reference is strictly single-process/single-GPU (SURVEY.md §2.5: the
only trace of distribution is a dead --horovod flag, helpers.py:164).
This module adds the first-class multi-host layer the TPU build needs:

  * `initialize()` — `jax.distributed.initialize` when running under a
    multi-host launcher (TPU pods set the cluster env automatically);
    no-op single-host.
  * `global_mesh()` — one ('data',) mesh over ALL devices of the slice;
    env batches are sharded over it, params replicated. Gradient/stat
    all-reduces ride ICI within a host's chips and DCN across hosts —
    XLA inserts them from the shardings; there is no hand-written
    collective layer to maintain.
  * `host_local_batch()` — the per-host slice of a global env batch:
    with N global envs over H hosts each host builds N/H envs' state and
    `make_global_array` assembles the sharded global arrays without ever
    materializing the full batch on one host.
  * `is_main()` — host-0 gating for logging/checkpointing (the runner's
    side effects happen once per job, not once per host).

Scaling stance (SURVEY.md §7.4.7): rollout physics is embarrassingly
data-parallel (envs never interact); the only global reductions are the
advantage normalization, gradient means, the adaptive-KL mean, and
logging sums — a few hundred KB per iteration against seconds of
compute, so ≥85 % scaling efficiency at 8 hosts is bandwidth-trivial;
the real risk is curriculum divergence, avoided by keeping all schedule
state as replicated device arrays derived from the (replicated) PPO
counter.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def cpu_device():
    """The host CPU device, or None if the CPU backend is unavailable
    (requires 'cpu' in jax_platforms — see runner/train.py)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def host_build():
    """Context manager: run eager array construction on the host CPU.

    Remote-attached accelerators (e.g. a tunneled TPU) pay an RPC
    round-trip + tiny-executable compile for EVERY eager op; env/state
    construction issues hundreds of unique tiny ops, which turns a
    seconds-long build into tens of minutes. Building on the CPU backend
    and bulk-transferring the finished state pytree (one fast DMA) keeps
    the accelerator for what it is good at: the big jitted graphs."""
    dev = cpu_device()
    return (jax.default_device(dev) if dev is not None
            else contextlib.nullcontext())


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the jax.distributed cluster. Safe to call unconditionally:
    single-process runs (no coordinator configured) are a no-op."""
    global _initialized
    if _initialized:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        # no cluster env to derive a coordinator from -> single-host run
        pass
    _initialized = True


def is_main() -> bool:
    """True on exactly one process (host 0): gate logging/ckpt writes."""
    return jax.process_index() == 0


def global_mesh() -> Mesh:
    """('data',) mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def host_env_count(num_envs_global: int) -> int:
    """Per-host env count; global batch must divide evenly."""
    n = jax.process_count()
    if num_envs_global % n:
        raise ValueError(f"num_envs={num_envs_global} not divisible by "
                         f"{n} hosts")
    return num_envs_global // n


def make_global_array(host_local, mesh: Mesh, num_envs_global: int):
    """Assemble a global sharded array from each host's local shard.

    host_local leaves are (num_envs_global / num_hosts, ...) arrays built
    with host-local RNG; the result is a pytree of global jax.Arrays with
    the env axis sharded over ('data',). Leaves whose first dim is not
    the local env count replicate (host 0's value wins — callers keep
    replicated leaves identical across hosts by construction)."""
    local_n = num_envs_global // jax.process_count()
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == local_n:
            global_shape = (num_envs_global,) + x.shape[1:]
            return jax.make_array_from_process_local_data(data, x,
                                                          global_shape)
        return jax.make_array_from_process_local_data(repl, x, x.shape)

    return jax.tree.map(place, host_local)
