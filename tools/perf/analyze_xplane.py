"""Aggregate a JAX xplane.pb device trace into per-op time shares.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/perf/analyze_xplane.py <trace.xplane.pb> [top_n]

Parses the raw XSpace proto (the tensorboard-plugin pipeline in this image
has a TF version mismatch) and prints, per device-plane line, the top ops
by total self duration — the data behind the round-3 train-step MFU work.
"""
import collections
import sys


def main(path, top_n=25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.lines or "TPU" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        print(f"=== plane {plane.name} ===")
        for line in plane.lines:
            total = collections.Counter()
            count = collections.Counter()
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                total[name] += ev.duration_ps
                count[name] += 1
            if not total:
                continue
            line_total = sum(total.values())
            print(f"--- line '{line.name}' ({len(line.events)} events, "
                  f"{line_total/1e9:.3f} ms total) ---")
            for name, ps in total.most_common(int(top_n)):
                print(f"{ps/1e9:10.3f} ms  {100*ps/line_total:5.1f}%  "
                      f"x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
