"""Aggregate per-op durations from an xplane.pb (TPU device plane).

Usage:
    with jax.profiler.trace(outdir):   # run the jitted program once
        float(fn(...))
    python tools/parse_xplane.py outdir/plugins/profile/*/vm.xplane.pb

Prints total duration per XLA op (custom-call rows are the Pallas
kernels). This is how the r3 dense-layout win was found: the
T(1,128)->T(8,128) copy-start rows around the kernel custom-calls were
~12% of the AIS sweep. Parse with tensorflow's bundled proto
(tensorflow.tsl.profiler.protobuf.xplane_pb2 — tensorboard_plugin_
profile does NOT ship it).

Caveat: copy-start/copy-done are ASYNC windows that overlap compute —
do not sum them naively; compare the while-loop total against the
kernel rows instead."""
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    ev_meta = plane.event_metadata
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        if "XLA Ops" not in line.name and "ops" not in line.name.lower():
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            tot[name] += ev.duration_ps / 1e6  # us
            cnt[name] += 1
    if not tot:
        # fall back: dump line names
        print(plane.name, [l.name for l in plane.lines])
        continue
    print(f"== plane: {plane.name}  total {sum(tot.values())/1e3:.3f} ms")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, us in rows[:40]:
        print(f"{us:10.1f} us  x{cnt[name]:5d}  {name[:110]}")
