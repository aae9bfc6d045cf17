#!/usr/bin/env python
"""Gradient-accumulation operating-point sweep for the primary metric.

Reuses bench.py's exact step/timing code (scan-slope, min-of-reps) with
ACCUM patched per row in ONE process, so rows share the relay's fixed
costs and are directly comparable (BASELINE.md methodology). The accum
semantics are the reference's --gradient_accumulation_steps
(train_hybrid.py:894-926): grads averaged over K micro-batches, one Adam
update.

Usage: python tools/bench_accum.py [--accums 1,2,4,8,16]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--accums", default="4,8,16")
    args = ap.parse_args()
    for a in [int(x) for x in args.accums.split(",")]:
        bench.ACCUM = a
        bench.BATCH = bench.MICRO * a
        print(f"== ACCUM={a} (global batch {bench.BATCH}) ==",
              file=sys.stderr, flush=True)
        bench.main()


if __name__ == "__main__":
    main()
