"""Collect-path bottleneck probe (VERDICT r3 item 2).

Times the fused physics step ALONE (widowGo1, 4 substeps incl. box) vs
the full env.step at several env counts on the live backend, and counts
the compiled HLO module's instructions/fusions — separating launch
latency (flat time vs N) from throughput (linear in N).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dwbc_tpu.envs.config import WidowGo1Cfg
from dwbc_tpu.envs.widowgo1 import WidowGo1Env
from dwbc_tpu.sim import dynamics

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))

counts = [int(x) for x in os.environ.get("PROBE_ENVS", "1024,4096,8192").split(",")]
print("backend:", jax.default_backend())

for N in counts:
    env = WidowGo1Env(WidowGo1Cfg(), num_envs=N, seed=1)
    state, obs = env.reset(jax.random.PRNGKey(0))

    # physics-only step
    @jax.jit
    def phys(state):
        fric = state.friction
        box_i_diag = jax.vmap(jnp.diag)(state.box_inert.inertia[:, 0])

        def tau_fn(carry, q_arr, qd_arr):
            return carry, env._pd_torques(
                jnp.zeros((N, 18)), q_arr[:, 7:25], qd_arr[:, 6:24],
                state.motor_strength)

        out, _, bq, bqd = env.fused_step(
            state.robot.q, state.robot.qd, tau_fn,
            state.inert.mass, state.inert.com, state.inert.inertia, fric,
            env.cfg.control.decimation,
            box_q=state.box.q, box_qd=state.box.qd,
            box_mass=state.box_inert.mass[:, 0], box_i_diag=box_i_diag,
            contact_carry=state.contact_carry)
        return out.q, bq, out.contact_carry

    @jax.jit
    def full(state, key):
        st, out = env.step(state, jnp.zeros((N, env.num_actions)),
                           jnp.asarray(0.0))
        return st, out.obs

    r = phys(state); jax.block_until_ready(r)
    t0 = time.perf_counter()
    M = 20
    for _ in range(M):
        r = phys(state)
    jax.block_until_ready(r)
    t_phys = (time.perf_counter() - t0) / M

    st, o = full(state, None); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(M):
        st, o = full(st, None)
    jax.block_until_ready(o)
    t_full = (time.perf_counter() - t0) / M

    print(f"N={N:6d}  phys4={t_phys*1e3:8.2f} ms  full_step={t_full*1e3:8.2f} ms"
          f"  phys/env-step={t_phys/N*1e9:7.1f} ns  full/env-step={t_full/N*1e9:7.1f} ns",
          flush=True)

    if N == counts[-1]:
        mod = phys.lower(state).compile()
        try:
            hlo = mod.as_text()
            n_fusion = hlo.count(" fusion(")
            n_instr = hlo.count("\n")
            print(f"compiled phys HLO: ~{n_instr} lines, {n_fusion} fusion calls")
        except Exception as e:
            print("hlo dump failed:", e)
