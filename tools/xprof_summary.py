#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb trace: per-op device-time totals.

No tensorflow/tensorboard dependency: decodes the protobuf wire format
directly (XSpace/XPlane/XLine/XEvent schema from xla's xplane.proto).

Usage: python tools/xprof_summary.py /tmp/trace_dir [top_n] [--by-category]
"""
import glob
import struct
import sys
from collections import defaultdict


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def iter_fields(buf):
    """Yield (field_number, wire_type, value) over a serialized message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, i = read_varint(buf, i)
        elif wt == 1:  # 64-bit
            val = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield field, wt, val


def parse_map_entry(buf):
    k = v = None
    for f, _, val in iter_fields(buf):
        if f == 1:
            k = val
        elif f == 2:
            v = val
    return k, v


def summarize(path, top_n=40, by_cat=False):
    data = open(path, "rb").read()
    for f, _, plane_buf in iter_fields(data):
        if f != 1:
            continue
        name = None
        ev_meta = {}
        lines = []
        for pf, _, pval in iter_fields(plane_buf):
            if pf == 2:
                name = pval.decode()
            elif pf == 3:
                lines.append(pval)
            elif pf == 4:
                k, v = parse_map_entry(pval)
                mname = ""
                for mf, _, mval in iter_fields(v):
                    if mf == 2:
                        mname = mval.decode()
                ev_meta[k] = mname
        if name is None or "TPU" not in name:
            continue
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line_buf in lines:
            lname = ""
            events = []
            for lf, _, lval in iter_fields(line_buf):
                if lf == 2:
                    lname = lval.decode()
                elif lf == 4:
                    events.append(lval)
            if "XLA Ops" not in lname:
                continue
            for ev_buf in events:
                mid = dur = 0
                occ = 1
                for ef, _, eval_ in iter_fields(ev_buf):
                    if ef == 1:
                        mid = eval_
                    elif ef == 3:
                        dur = eval_
                    elif ef == 5:
                        occ = eval_
                nm = ev_meta.get(mid, f"id{mid}")
                if by_cat:
                    nm = nm.split(".")[0].rstrip("0123456789-_")
                tot[nm] += dur / 1e9
                cnt[nm] += max(occ, 1)
        if tot:
            total = sum(tot.values())
            print(f"== {name}: {total:.2f} ms device time ==")
            for nm, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"{ms:9.2f} ms ({100*ms/total:4.1f}%) {cnt[nm]:7d}x  {nm[:100]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    by_cat = "--by-category" in sys.argv
    trace_dir = args[0]
    top_n = int(args[1]) if len(args) > 1 else 40
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")
    summarize(sorted(paths)[-1], top_n, by_cat)
