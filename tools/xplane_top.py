"""Parse a jax.profiler xplane.pb directly: top TPU ops by self time."""
import glob
import os
import sys
from collections import defaultdict

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1] if len(sys.argv) > 1 else sorted(glob.glob(
    "/tmp/dwbc_trace/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = defaultdict(int)
    cnt = defaultdict(int)
    for line in plane.lines:
        if "XLA Ops" not in line.name and "ops" not in line.name.lower():
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            tot[name] += ev.duration_ps
            cnt[name] += 1
    if not tot:
        # fall back: all lines
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?") + f" [{line.name}]"
                tot[name] += ev.duration_ps
                cnt[name] += 1
    total = sum(tot.values())
    print(f"== plane {plane.name}: total {total/1e9:.3f} ms over "
          f"{sum(cnt.values())} events ==")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {t/total*100:6.2f}%  {t/1e9:9.3f} ms  x{cnt[name]:5d}  "
              f"{name[:100]}")
