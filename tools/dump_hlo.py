"""Dump the compiled (backend-optimized) HLO text for one model family.

Usage: python tools/dump_hlo.py {geonet,flow,nnet,motion,vae,raft3d,
                                 raft3d_train} [--batch N] [--img_height H]
       [--img_width W] [--out /tmp/hlo_<fam>.txt]

Reuses tools/trace_family.py's workload builders; the compile runs on
whatever backend is active (on the axon tunnel this is the real TPU
pipeline, so fusion/op names line up with XProf traces for
tools/line_attrib.py --hlo joins).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family")
    ap.add_argument("--batch", default=0, type=int)
    ap.add_argument("--img_height", default=0, type=int)
    ap.add_argument("--img_width", default=0, type=int)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import trace_family as tf

    defaults = {"geonet": (128, 128, 416), "flow": (32, 128, 416),
                "nnet": (4, 480, 640), "motion": (16, 384, 768),
                "vae": (8, 128, 416), "raft3d": (1, 128, 416),
                "raft3d_train": (2, 128, 416)}
    db, dh, dw = defaults[args.family]
    batch = args.batch or db
    h = args.img_height or dh
    w = args.img_width or dw

    carry, advance = tf._build(args.family, batch, h, w)
    if not hasattr(advance, "lower1"):
        raise SystemExit(f"family {args.family} has no lower1 hook")
    txt = advance.lower1().compile().as_text()
    out = args.out or f"/tmp/hlo_{args.family}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(out, len(txt), "bytes")


if __name__ == "__main__":
    main()
