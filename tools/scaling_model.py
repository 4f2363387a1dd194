"""Scaling-efficiency model for the BASELINE >=85%/8-host target (r4).

Real multi-chip hardware is unavailable here, so this produces the two
things that make the target *arguable* from this repo (VERDICT r3 #7):

1. An exact audit of every cross-device collective in the compiled
   8-device training step (HLO dump of the real sharded collect + update
   graphs), with byte counts — distinguishing the cheap model-size
   all-reduces from any accidental batch-size resharding (the actual
   scaling hazard for an env-sharded PPO).
2. A derived per-iteration comm-time and weak-scaling efficiency
   projection, combining those byte counts with the *measured*
   single-chip iteration time (BENCH_r03/r04) and public v5e ICI
   bandwidth (45 GB/s/link one-way, 2D torus: jax-ml.github.io/
   scaling-book; ring all-reduce cost 2*(n-1)/n * bytes / bw).

Usage:  python tools/scaling_model.py [--devices 8] [--out logs/scaling_r04.json]
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}
_COLL_RE = re.compile(
    r"(\w+\[[\d,]*\][^ ]*|\([^)]*\))\s+"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(-start)?\(")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def audit_hlo(dump_dir: str):
    """Collect (module, op, bytes, in_while_loop) for every collective in
    the optimized HLO dumps."""
    out = []
    for path in sorted(glob.glob(os.path.join(
            dump_dir, "*after_optimizations.txt"))):
        mod = os.path.basename(path).split(".")[1][:60]
        body_depth = {}
        # map computation name -> called from while body? crude but
        # sufficient: HLO text lists computations; while ops name their
        # bodies `body=%name`. Collect while-body computation names first.
        text = open(path).read()
        while_bodies = set(re.findall(r"body=%?([\w.\-]+)", text))
        cur_comp = None
        for line in text.splitlines():
            mcomp = re.match(r"%?([\w.\-]+) \([^)]*\) -> ", line.strip())
            if line and not line.startswith(" ") and "{" in line:
                mc = re.search(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
                cur_comp = mc.group(1) if mc else cur_comp
            m = _COLL_RE.search(line)
            if m:
                out.append({
                    "module": mod,
                    "op": m.group(2),
                    "bytes": shape_bytes(m.group(1)),
                    "computation": cur_comp,
                    "in_loop_body": any(cur_comp and cur_comp in wb
                                        for wb in while_bodies)
                    or (cur_comp or "").startswith(("body", "while")),
                })
        os.remove(path)
    return out


def run_dryrun_with_dump(n_devices: int, dump_dir: str):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices} "
        f"--xla_dump_to={dump_dir} "
        "--xla_dump_hlo_pass_re=NOMATCH")
    env["JAX_PLATFORMS"] = "cpu"
    # force a real compile: a persistent-cache hit would skip compilation
    # and leave the HLO dump (this audit's input) empty
    env["DWBC_NO_COMPILE_CACHE"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g; g.dryrun_multichip(%d)\n" % n_devices)
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default="logs/scaling_r04.json")
    ap.add_argument("--bench", default=None,
                    help="BENCH json with measured single-chip times "
                         "(default: newest BENCH_r*.json)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = args.bench or sorted(glob.glob(
        os.path.join(root, "BENCH_r*.json")))[-1]
    bench = json.load(open(bench_path)).get("parsed", {})

    dump_dir = tempfile.mkdtemp(prefix="dwbc_hlo_")
    run_dryrun_with_dump(args.devices, dump_dir)
    colls = audit_hlo(dump_dir)

    # classify: model-sized (replicated-param grads / scalars) vs
    # batch-sized resharding (the hazard)
    per_iter_bytes = 0
    hazard = []
    # n_updates multiplies loop-body collectives (the minibatch scan)
    n_updates_default = 5 * 4  # reference num_learning_epochs*num_mini_batches
    for c in colls:
        mult = n_updates_default if c["in_loop_body"] else 1
        c["per_iter_bytes"] = c["bytes"] * mult
        per_iter_bytes += c["per_iter_bytes"]
        if c["bytes"] > 16 * 1024 * 1024:
            hazard.append(c)

    # ring all-reduce time on a 1D ICI ring of n chips
    n = args.devices
    ici_bw = 45e9  # v5e one-way per link (scaling book); conservative 1 link
    t_comm_s = 2.0 * per_iter_bytes * (n - 1) / n / ici_bw
    collect_s = bench.get("collection_time_s", 0.686)
    learn_s = bench.get("learn_time_s", 0.361)
    t_compute = collect_s + learn_s
    # weak scaling: same per-chip envs, comm added on top; plus a host-
    # sync term (measured multihost barrier cost unavailable -> 0 here,
    # flagged in notes)
    eff = t_compute / (t_compute + t_comm_s)

    result = {
        "what": "collective audit of the compiled 8-device training step "
                "+ derived weak-scaling efficiency projection",
        "devices_audited": n,
        "collectives": colls,
        "per_iteration_collective_bytes": per_iter_bytes,
        "batch_size_resharding_hazards": hazard,
        "measured_single_chip": {
            "source": os.path.basename(bench_path),
            "collection_time_s": collect_s,
            "learn_time_s": learn_s,
        },
        "model": {
            "ici_bw_bytes_per_s_one_way": ici_bw,
            "ring_allreduce_factor": f"2*(n-1)/n, n={n}",
            "t_comm_s_per_iteration": t_comm_s,
            "projected_weak_scaling_efficiency": eff,
            "meets_85pct_target": bool(eff >= 0.85),
        },
        "notes": [
            "Byte counts are exact (optimized-HLO audit of the real "
            "sharded graphs); times are a model — no multi-chip ICI "
            "hardware in this environment.",
            "Collectives inside while-loop bodies (the minibatch scan) "
            "are multiplied by the reference's 20 updates/iteration.",
            "Host-side skew (compile cache asymmetry, logging) is the "
            "real multihost risk per the r3 multihost test work, and is "
            "not part of this bandwidth model.",
        ],
    }
    os.makedirs(os.path.dirname(os.path.join(root, args.out)), exist_ok=True)
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in (
        "per_iteration_collective_bytes",)} | result["model"], indent=1))
    print(f"{len(colls)} collectives, {len(hazard)} batch-size hazards -> "
          f"{args.out}")


if __name__ == "__main__":
    main()
