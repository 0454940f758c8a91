"""Parse a jax.profiler xplane trace into an HLO-op time breakdown.

Usage:  python benchmarks/parse_trace.py <logdir-or-xplane.pb> [--top N]

Reads the TPU device plane directly with the protobuf schema bundled in
tensorflow (the tensorboard profile plugin's converter is incompatible with
the installed TF/protobuf pair). For each line of the device plane it
aggregates event durations by op name; the "XLA Ops" line gives per-HLO-op
totals, which is the breakdown driving the kernel-optimization work.
"""

from __future__ import annotations

import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import argparse      # noqa: E402
import collections   # noqa: E402
import glob          # noqa: E402
import sys           # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--line", default=None,
                    help="device-plane line name filter (default: the line "
                         "with the most events)")
    args = ap.parse_args()

    path = args.path
    if os.path.isdir(path):
        xplanes = sorted(glob.glob(
            os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    else:
        xplanes = [path]
    if not xplanes:
        print("no xplane under", path)
        sys.exit(1)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        xs.ParseFromString(f.read())

    device = None
    for p in xs.planes:
        if "/device:TPU" in p.name or "/device:CUSTOM" in p.name:
            device = p
            if "/device:TPU" in p.name:
                break
    if device is None:
        print("planes:", [p.name for p in xs.planes])
        sys.exit(1)

    meta = device.event_metadata
    print(f"plane: {device.name}")
    print("lines:", [(ln.name, len(ln.events)) for ln in device.lines])

    lines = [ln for ln in device.lines
             if args.line is None or ln.name == args.line]
    if args.line is None:
        lines = [max(lines, key=lambda ln: len(ln.events))]

    for ln in lines:
        agg = collections.defaultdict(lambda: [0, 0])   # name -> [ps, count]
        for ev in ln.events:
            name = meta[ev.metadata_id].name
            agg[name][0] += ev.duration_ps
            agg[name][1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for v in agg.values())
        print(f"\n=== line '{ln.name}': total {total / 1e9:.2f} ms ===")
        print(f"{'ms':>10} {'%':>6} {'count':>6}  op")
        for name, (ps, cnt) in rows[: args.top]:
            print(f"{ps / 1e9:>10.3f} {100.0 * ps / max(total, 1):>6.2f} "
                  f"{cnt:>6}  {name[:140]}")


if __name__ == "__main__":
    main()
