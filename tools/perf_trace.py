"""Capture a jax.profiler trace of the widowGo1 fused physics step and
print the top self-time ops (via tensorboard_plugin_profile xplane
conversion) — locates where the 4.4 us/env-step actually goes."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dwbc_tpu.envs.config import WidowGo1Cfg
from dwbc_tpu.envs.widowgo1 import WidowGo1Env

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dwbc_jax"))

N = int(os.environ.get("PROBE_ENVS", "8192"))
env = WidowGo1Env(WidowGo1Cfg(), num_envs=N, seed=1)
state, obs = env.reset(jax.random.PRNGKey(0))


@jax.jit
def full(state):
    st, out = env.step(state, jnp.zeros((N, env.num_actions)),
                       jnp.asarray(0.0))
    return st, out.obs


st, o = full(state)
jax.block_until_ready(o)
out_dir = "/tmp/dwbc_trace"
os.system(f"rm -rf {out_dir}")
jax.profiler.start_trace(out_dir)
for _ in range(5):
    st, o = full(st)
jax.block_until_ready(o)
jax.profiler.stop_trace()

xplanes = glob.glob(out_dir + "/**/*.xplane.pb", recursive=True)
print("xplane:", xplanes, flush=True)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
prof = json.loads(data)


def walk(node, depth=0, out=None):
    m = node.get("metrics", {})
    out.append((m.get("time", 0.0), node.get("name", "?"), depth))
    for c in node.get("children", []):
        walk(c, depth + 1, out)
    return out


root = prof.get("byProgram") or prof.get("byCategory")
rows = walk(root, 0, [])
# leaf ops only (no children): approximate by depth>=2 entries
print("== top op_profile nodes by time fraction ==")
for t, name, d in sorted(rows, reverse=True)[:40]:
    print(f"  {t*100:6.2f}%  d{d}  {name[:110]}")
