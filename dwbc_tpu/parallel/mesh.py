"""SPMD scaling over TPU meshes.

The reference's only parallelism is single-GPU env vectorization
(SURVEY.md §2.5); here the env batch is sharded over a ('data',) mesh
axis with replicated params. Because envs never interact physically, the
rollout is embarrassingly data-parallel; the only cross-shard reductions
in the whole algorithm are the global advantage normalization
(rollout_storage.py:149-150), gradient means, the KL mean, and logging
sums — all of which XLA derives automatically from the shardings (psum
over ICI), replacing an explicit NCCL layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def shard_env_state(state, mesh: Mesh, num_envs: int):
    """Place every (num_envs, ...) leaf with PartitionSpec('data'); scalars
    and small vectors replicate."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    return jax.tree.map(place, state)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)
