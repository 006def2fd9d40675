"""Aggregate a jax.profiler xplane trace into per-op totals (r3).

The axon tunnel does capture the TPU device plane, so op-level
decomposition works on this image — this is how the beam-15 layout
pathology was found (docs/performance.md). tensorboard's converter
bindings are broken here (missing pywrap symbol), so this parses the
xplane protobuf directly via tensorflow's tsl bindings.

Usage: python tools/trace_ops.py <trace_dir> [top_n]
       trace_dir is the directory passed to jax.profiler.trace()
"""

import collections
import glob
import sys


def aggregate(trace_dir: str, top_n: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tpu = [p for p in xs.planes if "TPU" in p.name]
    if not tpu:
        raise SystemExit(
            f"no TPU plane (planes: {[p.name for p in xs.planes]})"
        )
    plane = tpu[0]
    md = plane.event_metadata
    tot, cnt = collections.Counter(), collections.Counter()
    for line in plane.lines:
        if "step" in line.name.lower():
            continue
        for e in line.events:
            name = md[e.metadata_id].name
            tot[name] += e.duration_ps / 1e9  # ms
            cnt[name] += 1
    return tot, cnt


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wf_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    tot, cnt = aggregate(trace_dir, top_n)
    print("top ops by total ms (all lines incl. async/overlapped):")
    for name, ms in tot.most_common(top_n):
        print(f"{ms:9.3f} ms  x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
