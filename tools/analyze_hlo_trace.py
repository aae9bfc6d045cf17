"""Join a device trace with the optimized HLO: per-fusion bytes, achieved
GB/s vs the ~819 GB/s HBM bound, and a category rollup.

Inputs are the two artifacts tools/profile_step.py leaves behind:
  /tmp/lunaris_step_hlo.txt            (optimized HLO text)
  <tracedir>/**/*.trace.json.gz        (device trace)

For every fusion executed on the device lane it reports: time/step, output
bytes, input bytes (from the called computation's parameter shapes), the
implied read+write bandwidth, and a guessed category:
  adam          triple-f32 same-shape outputs (optimizer update)
  conv          backend window_config with nonempty kernel_window_bounds,
                activation-shaped output
  wgrad         conv whose output is weight-shaped (<= 1 MB)
  gn_reduce     outputs include per-channel f32 vectors next to a big
                activation (the GN stats passes)
  elementwise   kLoop over activations
Usage: python tools/analyze_hlo_trace.py <tracedir> [--steps 8]
"""

import argparse
import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "u8": 1, "s8": 1, "f16": 2, "u64": 8, "s64": 8}

SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s64|u64|pred|u8|s8)\[([\d,]*)\]")


def shape_bytes(text):
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_hlo(path):
    txt = Path(path).read_text()
    info = {}
    comp_params = defaultdict(int)
    cur = None
    for line in txt.splitlines():
        ls = line.strip()
        # computation header: %fused_computation.N (p0: shape, ...) -> ... {
        m = re.match(r"%?(fused_computation[\w\.\-]*)\s*\(", ls)
        if m and ls.endswith("{"):
            cur = m.group(1)
            header = ls[ls.index("("):]
            comp_params[cur] = shape_bytes(header.split("->")[0])
            continue
        if ls == "}":
            cur = None
        # fusion call site: %name = <outs> fusion(...), kind=..., calls=%comp
        cm = re.match(r"(?:ROOT )?%([\w\.\-]*fusion[\w\.\-]*) = (.*?) fusion\(",
                      ls)
        if cm and " calls=" in ls:
            name, outs = cm.groups()
            km = re.search(r"kind=(\w+)", ls)
            cc = re.search(r"calls=%([\w\.\-]+)", ls)
            wm = re.search(r'"kernel_window_bounds":\[([^\]]*)\]', ls)
            info[name] = {
                "out_bytes": shape_bytes(outs),
                "kind": km.group(1) if km else "?",
                "comp": cc.group(1) if cc else "?",
                "window": bool(wm and wm.group(1).strip()),
                "outs": outs,
            }
    for v in info.values():
        v["in_bytes"] = comp_params.get(v["comp"], 0)
    return info


def categorize(name, v):
    outs = v["outs"]
    triple_f32 = outs.count("f32[") >= 3 and "bf16[" not in outs
    big_act = any(len(d.split(",")) == 4 and int(d.split(",")[0]) > 1
                  for _, d in SHAPE_RE.findall(outs))
    if "multiply_add" in name or triple_f32 and v["out_bytes"] > 3e7:
        return "adam"
    if v["window"]:
        return "wgrad" if v["out_bytes"] < 1e6 else "conv"
    if "convert_reduce" in name or (re.search(r"f32\[\d{1,4}\]", outs)
                                    and big_act):
        return "gn_reduce"
    if v["kind"] == "kLoop":
        return "elementwise"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--hlo", default="/tmp/lunaris_step_hlo.txt")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    info = parse_hlo(args.hlo)
    paths = glob.glob(str(Path(args.tracedir) / "**" / "*.trace.json.gz"),
                      recursive=True)
    d = json.load(gzip.open(paths[0]))
    evs = [e for e in d["traceEvents"] if e.get("ph") == "X"]
    dev_pids = {e["pid"] for e in evs if "fusion" in e.get("name", "")}
    agg = defaultdict(float)
    for e in evs:
        if e["pid"] in dev_pids and not e["name"].startswith(
                ("while", "jit_", "0")):
            agg[e["name"]] += e.get("dur", 0) / args.steps / 1e3  # ms/step

    rows = []
    for name, t in agg.items():
        v = info.get(name)
        if v is None:
            rows.append((t, name, "untracked", 0, 0))
            continue
        cat = categorize(name, v)
        gb = (v["in_bytes"] + v["out_bytes"]) / 1e9
        rows.append((t, name, cat, gb, gb / (t / 1e3) if t else 0))

    rows.sort(reverse=True)
    print(f"{'ms':>7} {'cat':<11} {'GB':>7} {'GB/s':>6}  name")
    for t, name, cat, gb, bw in rows[:args.top]:
        print(f"{t:7.3f} {cat:<11} {gb:7.3f} {bw:6.0f}  {name}")

    roll = defaultdict(float)
    rollb = defaultdict(float)
    for t, name, cat, gb, bw in rows:
        roll[cat] += t
        rollb[cat] += gb
    total = sum(roll.values())
    print("\ncategory rollup:")
    for cat, t in sorted(roll.items(), key=lambda kv: -kv[1]):
        bw = rollb[cat] / (t / 1e3) if t else 0
        print(f"  {cat:<11} {t:7.3f} ms ({100 * t / total:4.1f}%)  "
              f"{rollb[cat]:6.2f} GB @ {bw:5.0f} GB/s")
    print(f"  TOTAL       {total:7.3f} ms   "
          f"{sum(rollb.values()):6.2f} GB")


if __name__ == "__main__":
    main()
