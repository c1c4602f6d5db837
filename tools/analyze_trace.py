#!/usr/bin/env python3
"""Aggregate op self-times from a jax.profiler trace (xplane.pb).

Usage: python tools/analyze_trace.py /tmp/jaxprof [N]
Prints the top-N ops by total self-duration per plane (device/host).
"""

import glob
import sys
from collections import defaultdict


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    files = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not files:
        sys.exit(f"no xplane.pb under {root}")
    for fp in files:
        xs = load_xspace(fp)
        for plane in xs.planes:
            if not ("TPU" in plane.name or "CPU" in plane.name
                    or "/device" in plane.name.lower()):
                continue
            em = {m.id: m.name for m in plane.event_metadata.values()}
            tot = defaultdict(int)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    name = em.get(ev.metadata_id, "?")
                    tot[name] += ev.duration_ps
                    cnt[name] += 1
            if not tot:
                continue
            total_ps = sum(tot.values())
            print(f"\n=== plane: {plane.name}  "
                  f"(total {total_ps/1e12:.4f} s across lines)")
            for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:topn]:
                print(f"{ps/1e9:10.3f} ms  {100.0*ps/total_ps:5.1f}%  "
                      f"x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
