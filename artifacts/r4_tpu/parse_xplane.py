"""Parse the committed xplane.pb (public XPlane schema, compiled locally):

    protoc --python_out=. xplane.proto
    python parse_xplane.py hostprefetch_trace/plugins/profile/*/vm.xplane.pb
"""
import sys

import xplane_pb2


def main(path):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for p in xs.planes:
        if p.name != "/device:TPU:0":
            continue
        em = p.event_metadata
        for line in p.lines:
            name = line.display_name or line.name
            if name not in ("Steps", "XLA Ops", "Async XLA Ops"):
                continue
            evs = [(em[e.metadata_id].name, e.offset_ps / 1e9,
                    e.duration_ps / 1e9) for e in line.events]
            print(f"== {name} ({len(evs)} events; top 12 by duration)")
            for n, o, d in sorted(evs, key=lambda x: -x[2])[:12]:
                print(f"  off {o:9.2f} ms  dur {d:8.2f} ms  {n[:90]}")


if __name__ == "__main__":
    main(sys.argv[1])
