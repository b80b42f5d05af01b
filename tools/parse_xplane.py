"""Parse a jax.profiler xplane.pb and print top device ops by total time.

Usage: python tools/parse_xplane.py /tmp/jaxprof  (finds the newest *.xplane.pb)
Standalone protobuf parse — the tensorboard profile-plugin converter is
incompatible with the installed TF, so aggregate XLA-op events directly.
"""
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    files = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not files:
        print("no xplane found under", root)
        return
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata.items())
        stat_names = dict(plane.stat_metadata.items())
        agg = defaultdict(lambda: [0.0, 0])
        total = 0.0
        for line in plane.lines:
            lname = line.name
            if "XLA Ops" not in lname and "XLA TraceMe" not in lname and lname != "Steps":
                # keep only the op-level line if present; fall back to all
                pass
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else f"id{ev.metadata_id}"
                dur = ev.duration_ps / 1e9  # ms
                agg[(lname, name)][0] += dur
                agg[(lname, name)][1] += 1
        # group by line
        by_line = defaultdict(list)
        for (lname, name), (dur, cnt) in agg.items():
            by_line[lname].append((dur, cnt, name))
        print(f"== plane: {plane.name}")
        for lname, rows in by_line.items():
            rows.sort(reverse=True)
            tot = sum(r[0] for r in rows)
            print(f"-- line: {lname}  total {tot:.2f} ms over {sum(r[1] for r in rows)} events")
            for dur, cnt, name in rows[:40]:
                print(f"   {dur:9.3f} ms  x{cnt:<5d} {name[:140]}")


if __name__ == "__main__":
    main()
