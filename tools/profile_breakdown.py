#!/usr/bin/env python
"""Summarize a jax.profiler trace (xplane.pb) into a device-time breakdown.

The trainer's CRANK_TPU_PROFILE hook (crank_tpu/train/trainer.py) captures
steps 10..30 of a training segment with jax.profiler; this tool turns the
resulting ``*.xplane.pb`` into the three numbers the MFU discussion needs
(VERDICT r4 weak #3):

  * device busy fraction vs idle (dispatch/input) gaps inside the window,
  * time by op category (convolution/dot = MXU work, fusions = elementwise
    /HBM-bound work, copies/collectives, scalar bookkeeping),
  * the top ops by total device time.

The upstream converter (tensorboard_plugin_profile -> xspace_to_tools_data)
is broken against this image's TF build, so the XSpace protobuf is parsed
directly; run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the
C++ protobuf rejects the descriptor pool.

Usage:  python tools/profile_breakdown.py <profile_dir_or_xplane.pb> [--json]
"""

import argparse
import collections
import json
import os
import sys
from pathlib import Path


def _load_xspace(path: Path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(path.read_bytes())
    return xs


def _find_xplane_pb(root: Path) -> Path:
    if root.is_file():
        return root
    cands = sorted(root.rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime)
    if not cands:
        sys.exit(f"no *.xplane.pb under {root}")
    return cands[-1]


CATEGORIES = (
    # (label, name-substring predicates) — first match wins
    ("mxu (conv/dot)", ("convolution", "%dot", "dot.", "dot_general",
                        "einsum", "matmul")),
    ("copy/transpose", ("copy", "transpose", "reshape", "bitcast")),
    ("collectives", ("all-reduce", "all-gather", "reduce-scatter",
                     "collective", "permute")),
    ("dynamic-slice/gather", ("dynamic", "gather", "scatter", "slice")),
    ("rng", ("rng", "random")),
    ("fusion (elementwise/HBM)", ("fusion", "fused")),
)


def _category(name: str) -> str:
    low = name.lower()
    for label, keys in CATEGORIES:
        if any(k in low for k in keys):
            return label
    return "other"


def summarize(xplane_path: Path):
    xs = _load_xspace(xplane_path)
    dev_planes = [p for p in xs.planes
                  if "TPU" in p.name or "/device:" in p.name.upper()
                  or "accelerator" in p.name.lower()]
    if not dev_planes:
        sys.exit("no device plane found; planes: "
                 + ", ".join(p.name for p in xs.planes))
    out = []
    for plane in dev_planes:
        meta = plane.event_metadata
        by_name = collections.Counter()
        n_events = collections.Counter()
        async_by_name = collections.Counter()
        span_lo, span_hi = None, 0
        busy_by_line = {}
        for line in plane.lines:
            lname = line.name or str(line.id)
            # synchronous op timelines feed the category table; the
            # async-DMA line (overlapping events) is tallied separately
            is_async = "Async" in lname
            is_ops = "Ops" in lname or "Modules" not in lname
            busy = 0
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = (m.display_name or m.name) if m else str(ev.metadata_id)
                dur = ev.duration_ps
                start = line.timestamp_ns * 1000 + ev.offset_ps
                span_lo = start if span_lo is None else min(span_lo, start)
                span_hi = max(span_hi, start + dur)
                if is_async:
                    async_by_name[name] += dur
                elif is_ops and "Steps" not in lname:
                    by_name[name] += dur
                    n_events[name] += 1
                busy += dur
            busy_by_line[lname] = busy
        if not by_name:
            continue
        # busy fraction comes from the synchronous op timeline ("XLA Ops");
        # the "Async XLA Ops" line holds overlapping DMA-queue events whose
        # summed duration legitimately exceeds the window and the "Steps"
        # line spans everything — neither measures compute occupancy
        total_busy = busy_by_line.get("XLA Ops") or max(
            v for k, v in busy_by_line.items() if "Async" not in k
        )
        span = (span_hi - span_lo) if span_lo is not None else 0
        cat = collections.Counter()
        for name, dur in by_name.items():
            cat[_category(name)] += dur
        top = by_name.most_common(12)
        out.append({
            "plane": plane.name,
            "window_ms": round(span / 1e9, 3),
            "busy_ms": round(total_busy / 1e9, 3),
            "busy_frac": round(total_busy / span, 4) if span else None,
            "lines_busy_ms": {
                k: round(v / 1e9, 3) for k, v in busy_by_line.items()
            },
            "by_category_ms": {
                k: round(v / 1e9, 3) for k, v in cat.most_common()
            },
            "async_dma_ms": round(
                sum(async_by_name.values()) / 1e9, 3),
            "top_ops": [
                {"name": n[:120], "ms": round(d / 1e9, 3),
                 "count": n_events[n]} for n, d in top
            ],
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir (searched) or xplane.pb file")
    ap.add_argument("--json", action="store_true", help="JSON to stdout")
    args = ap.parse_args()
    path = _find_xplane_pb(Path(args.path))
    res = summarize(path)
    if args.json:
        print(json.dumps({"xplane": str(path), "planes": res}, indent=1))
        return
    print(f"trace: {path}")
    for p in res:
        print(f"\n== {p['plane']} ==")
        print(f"window {p['window_ms']:.1f} ms, device busy "
              f"{p['busy_ms']:.1f} ms ({100 * (p['busy_frac'] or 0):.1f}%)")
        print("by category:")
        for k, v in p["by_category_ms"].items():
            print(f"  {k:28s} {v:9.2f} ms")
        print("top ops:")
        for t in p["top_ops"]:
            print(f"  {t['ms']:9.2f} ms  x{t['count']:<5d} {t['name']}")


if __name__ == "__main__":
    main()
