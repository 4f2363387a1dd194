"""Scripted-trot probe: what does STEPPING actually cost in the widowGo1
reward calculus vs standing? (r4 flagship diagnosis)

Drives the env open-loop with a diagonal-trot action pattern (thigh/calf
sinusoids, hips zero, arm at default) and reports per-step raw
energy_square / foot_contacts_z / tracking terms vs a standing rollout —
the marginal cost of locomotion that the leg head's advantage sees. If
trot >> standing by more than the tracking ceiling (+0.5*|cmd| raw), the
stand-still equilibrium is reward-rational and the gap is a contact-
transient fidelity question; if comparable, the barrier is exploration.

Run: python tools/gait_probe.py [--amp 0.35] [--freq 2.0] [--steps 150]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", type=float, default=0.35)
    ap.add_argument("--freq", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dwbc_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from dwbc_tpu.envs.config import WidowGo1Cfg
    from dwbc_tpu.envs.widowgo1 import WidowGo1Env

    env = WidowGo1Env(WidowGo1Cfg(), num_envs=args.envs, seed=3)
    state, obs = env.reset(jax.random.PRNGKey(0))
    dt = env.dt

    # trot: diagonal pairs (FL+RR) vs (FR+RL) in antiphase.
    # leg order (hardware): FR, FL, RR, RL x (hip, thigh, calf)
    phase_of_leg = jnp.asarray([0.0, jnp.pi, jnp.pi, 0.0])

    step_jit = jax.jit(env.step)

    def actions_at(t, amp, swing_fwd):
        ph = 2 * jnp.pi * args.freq * t + phase_of_leg
        a = jnp.zeros((args.envs, 18))
        for leg in range(4):
            s = jnp.sin(ph[leg])
            c = jnp.maximum(jnp.sin(ph[leg]), 0.0)  # lift only half cycle
            # thigh swing (+ forward bias), calf lift
            a = a.at[:, leg * 3 + 1].set(-amp * s * swing_fwd)
            a = a.at[:, leg * 3 + 2].set(amp * 1.2 * c)
        return a

    def rollout(kind):
        st, _ = env.reset(jax.random.PRNGKey(1))
        sums = {"energy_square": 0.0, "foot_contacts_z": 0.0,
                "tracking_lin_vel_x_l1": 0.0}
        vx_sum, alive_steps, resets = 0.0, 0, 0
        met_prev = {k: jnp.zeros((args.envs,)) for k in sums}
        for i in range(args.steps):
            t = i * dt
            if kind == "trot":
                act = actions_at(t, args.amp, 1.0)
            elif kind == "march":
                act = actions_at(t, args.amp, 0.0)   # step in place
            else:
                act = jnp.zeros((args.envs, 18))
            st, out = step_jit(st, act, jnp.asarray(1e9))
            # metric_sums reset on env reset; accumulate per-step deltas
            for k in sums:
                cur = st.metric_sums[k]
                delta = jnp.where(cur >= met_prev[k], cur - met_prev[k], cur)
                sums[k] += float(jnp.sum(delta))
                met_prev[k] = cur
            base_quat = st.robot.q[:, 3:7]
            from dwbc_tpu.core import maths
            v = maths.quat_rotate_inverse(base_quat, st.robot.qd[:, 0:3])
            vx_sum += float(jnp.sum(v[:, 0]))
            alive_steps += args.envs
            resets += int(jnp.sum(out.reset))
        n = alive_steps
        return {k: v / n for k, v in sums.items()} | {
            "mean_vx": vx_sum / n,
            "resets_per_env": resets / args.envs,
        }

    print(f"amp={args.amp} freq={args.freq} steps={args.steps}")
    for kind in ("stand", "march", "trot"):
        r = rollout(kind)
        # raw reward-calculus contributions per step (scale * term)
        e = -6e-5 * r["energy_square"]
        f = -1e-4 * r["foot_contacts_z"]
        print(f"{kind:6s} vx={r['mean_vx']:+.3f} "
              f"E2/step={r['energy_square']:9.0f} (rew {e:+.3f}) "
              f"Fz2/step={r['foot_contacts_z']:9.0f} (rew {f:+.3f}) "
              f"resets/env={r['resets_per_env']:.2f}")
    print("tracking ceiling at |cmd|=0.4: +0.5*0.4 = +0.200 raw/step;"
          " survive +0.200")


if __name__ == "__main__":
    main()
