"""Minimal XSpace (xplane.pb) parser: per-op TPU time aggregation.

The baked-in tensorboard_plugin_profile is incompatible with the installed
TF/protobuf, so this decodes the protobuf wire format directly (fields per
tsl/profiler/protobuf/xplane.proto) and sums XEvent durations by op name on
the /device:TPU:0 plane's "XLA Ops" and "XLA Modules" lines.

Usage: python tools/xprof.py <trace_dir_or_xplane.pb> [n_frames] [top_k]
"""

import collections
import glob
import sys


def parse(buf):
    i, n = 0, len(buf)
    while i < n:
        key = 0; shift = 0
        while True:
            b = buf[i]; i += 1
            key |= (b & 0x7f) << shift; shift += 7
            if not b & 0x80: break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                v |= (b & 0x7f) << shift; shift += 7
                if not b & 0x80: break
            yield field, wire, v
        elif wire == 2:
            ln = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                ln |= (b & 0x7f) << shift; shift += 7
                if not b & 0x80: break
            yield field, wire, buf[i:i+ln]; i += ln
        elif wire == 5:
            yield field, wire, buf[i:i+4]; i += 4
        elif wire == 1:
            yield field, wire, buf[i:i+8]; i += 8


def op_times(path, plane_name="/device:TPU:0"):
    """{line_name: {op_name: (total_ps, count)}} summed over the trace."""
    data = open(path, "rb").read()
    out = {}
    for p in (v for f, w, v in parse(data) if f == 1):
        pname, meta, lines = None, {}, []
        for f, w, v in parse(p):
            if f == 2 and w == 2: pname = v.decode()
            elif f == 4:
                kid, mname = None, None
                for f2, w2, v2 in parse(v):
                    if f2 == 1: kid = v2
                    elif f2 == 2 and w2 == 2:
                        for f3, w3, v3 in parse(v2):
                            if f3 == 2 and w3 == 2: mname = v3.decode()
                if kid is not None: meta[kid] = mname
            elif f == 3: lines.append(v)
        if pname != plane_name: continue
        for ln in lines:
            lname = None
            for f2, w2, v2 in parse(ln):
                if f2 == 2 and w2 == 2: lname = v2.decode()
            agg = out.setdefault(lname, collections.defaultdict(lambda: [0, 0]))
            for f2, w2, v2 in parse(ln):
                if f2 == 4 and w2 == 2:
                    mid, dur = None, 0
                    for f3, w3, v3 in parse(v2):
                        if f3 == 1: mid = v3
                        elif f3 == 3 and w3 == 0: dur = v3
                    a = agg[meta.get(mid, f"id{mid}")]
                    a[0] += dur; a[1] += 1
    return out


def main():
    arg = sys.argv[1]
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top_k = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    files = ([arg] if arg.endswith(".pb")
             else glob.glob(arg + "/**/*.xplane.pb", recursive=True))
    t = op_times(files[0])
    for lname in ("XLA Modules", "XLA Ops"):
        agg = t.get(lname, {})
        tot = sum(d for d, _ in agg.values())
        print(f"== {lname}: {tot/1e9/frames:.3f} ms/frame")
        for name, (d, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_k]:
            print(f"  {d/1e9/frames:9.4f} ms x{c:5d}  {name[:120]}")


if __name__ == "__main__":
    main()
