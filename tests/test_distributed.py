"""Multi-host/SPMD helpers on the 8-virtual-device CPU mesh.

The full sharded train step is exercised by __graft_entry__.dryrun_multichip
(driver-run); these cover the orchestration helpers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from dwbc_tpu.parallel import distributed as dist
from dwbc_tpu.parallel import mesh as mesh_lib


def test_initialize_noop_single_host():
    dist.initialize()  # must not raise or hang without a coordinator
    assert dist.is_main()
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = dist.global_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("data",)


def test_make_global_array_shards_env_axis():
    mesh = dist.global_mesh()
    n = 16
    tree = {"per_env": np.arange(n * 3, dtype=np.float32).reshape(n, 3),
            "scalar": np.float32(7.0),
            "small": np.ones((4,), np.float32)}
    out = dist.make_global_array(tree, mesh, n)
    assert out["per_env"].sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out["per_env"]), tree["per_env"])
    assert np.asarray(out["scalar"]) == 7.0
    # a psum over the sharded axis must see the global batch
    def mean_fn(x):
        return jnp.mean(x)
    assert abs(float(jax.jit(mean_fn)(out["per_env"]))
               - tree["per_env"].mean()) < 1e-6


def test_shard_env_state_places_batch_axis():
    mesh = mesh_lib.make_mesh(8)
    n = 8
    tree = {"q": jnp.zeros((n, 27)), "step": jnp.zeros(())}
    out = mesh_lib.shard_env_state(tree, mesh, n)
    assert out["q"].sharding.spec == P("data")
    assert out["step"].sharding.spec == P()


def test_host_env_count():
    assert dist.host_env_count(4096) == 4096
