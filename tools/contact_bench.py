"""Measure the two contact-law execution strategies at production scale
(VERDICT r4 item 4's done-bar): the XLA-fused path vs the Pallas kernel
(ops/contact_pallas.py), both calling the SAME
sim/contact.fused_terrain_law, on the flagship widowGo1 collect at
DWBC_BENCH_ENVS envs (default 8192).

Writes logs/contact_path_bench.json; bench.py embeds it into the
BENCH_r* record so the winner AND the loser's number are retained.

Usage: python tools/contact_bench.py [--steps 40] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_collect(num_envs, steps, reps):
    """Fresh env + runner under the CURRENT DWBC_PALLAS_CONTACT setting;
    returns best-of-reps collect wall seconds."""
    import jax
    import jax.numpy as jnp

    from dwbc_tpu.envs.config import WidowGo1Cfg
    from dwbc_tpu.envs.widowgo1 import WidowGo1Env
    from dwbc_tpu.rl import ppo as ppo_lib
    from dwbc_tpu.rl.runner import OnPolicyRunner

    env = WidowGo1Env(WidowGo1Cfg(), num_envs=num_envs, seed=1)
    runner = OnPolicyRunner(env, ppo_lib.PPOConfig(),
                            num_steps_per_env=steps, seed=1)

    # drive through runner.learn (same path as bench.py / production);
    # runner.last_collection_time isolates the collect wall clock
    t0 = time.time()
    runner.learn(1, log_every=1000)   # compile
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        runner.learn(1, log_every=1000)
        best = min(best, runner.last_collection_time)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="logs/contact_path_bench.json")
    args = ap.parse_args()
    num_envs = int(os.environ.get("DWBC_BENCH_ENVS", 8192))

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dwbc_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    results = {}
    for name, flag in (("xla_fused", ""), ("pallas_kernel", "1")):
        # the flag is read at make_fused_substep build time; a fresh env
        # per setting keeps the two paths honest
        if flag:
            os.environ["DWBC_PALLAS_CONTACT"] = flag
        else:
            os.environ.pop("DWBC_PALLAS_CONTACT", None)
        t, compile_s = measure_collect(num_envs, args.steps, args.reps)
        results[name] = {
            "collect_s": round(t, 4),
            "env_steps_per_s": round(num_envs * args.steps / t, 1),
            "compile_s": round(compile_s, 1),
        }
        print(f"{name}: collect {t:.4f} s "
              f"({num_envs * args.steps / t:,.0f} env-steps/s), "
              f"compile {compile_s:.1f} s", flush=True)

    winner = min(results, key=lambda k: results[k]["collect_s"])
    out = {
        "num_envs": num_envs,
        "steps_per_collect": args.steps,
        "paths": results,
        "winner": winner,
        "note": ("both paths execute sim/contact.fused_terrain_law; "
                 "parity: tests/test_contact_pallas.py"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
