"""Plot training curves from Trainer metrics.jsonl files (r4 demo).

Small-multiple line charts of the hybrid loop's key scalars over optimizer
steps, overlaying up to two runs (e.g. global attention vs --attn_window
256 from the same init). One y-axis per panel, 2px lines, recessive grid,
legend + direct end-labels, colors by run identity in fixed order
(slots 1/2 of the validated default categorical palette).

Usage:
  python tools/plot_demo_curves.py --run NAME=path/metrics.jsonl \
      [--run NAME=path2/metrics.jsonl] --out docs/demo_r4_curves.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Validated default categorical palette, fixed order (dataviz reference).
COLORS = ["#2a78d6", "#eb6834"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"

PANELS = [
    ("recon_loss", "Reconstruction loss"),
    ("kl_loss", "KL loss"),
    ("quality_reward", "Teacher quality reward"),
    ("semantic_reward", "Semantic reward"),
    ("total_loss", "Total loss"),
    ("val_recon_loss", "Validation recon loss"),
]


def load(path: str):
    # Epoch-end validation scalars ride the train prefix (Trainer logs one
    # merged row per epoch), so no prefix filtering — panels pick by key.
    rows = [json.loads(line) for line in open(path)]
    rows.sort(key=lambda r: r["step"])
    return rows


def series(rows, key):
    xs = [r["step"] for r in rows if key in r]
    ys = [r[key] for r in rows if key in r]
    return xs, ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="append", required=True,
                    metavar="NAME=metrics.jsonl")
    ap.add_argument("--out", required=True)
    ap.add_argument("--title", default="Hybrid training on the 6,144-sprite "
                                       "procedural corpus (128px, 1× v5e)")
    args = ap.parse_args()

    runs = []
    for spec in args.run[:2]:
        name, path = spec.split("=", 1)
        runs.append((name, load(path)))

    fig, axes = plt.subplots(2, 3, figsize=(13.5, 7.2), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    for ax, (key, title) in zip(axes.flat, PANELS):
        ax.set_facecolor(SURFACE)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        for spine in ("left", "bottom"):
            ax.spines[spine].set_color(GRID)
        ax.grid(True, color=GRID, linewidth=0.6, alpha=0.8)
        ax.set_axisbelow(True)
        ax.tick_params(colors=TEXT2, labelsize=8)
        ax.set_title(title, fontsize=10, color=TEXT, loc="left")
        for (name, rows), color in zip(runs, COLORS):
            xs, ys = series(rows, key)
            if not xs:
                continue
            ax.plot(xs, ys, color=color, linewidth=2, label=name,
                    solid_capstyle="round")
            ax.annotate(f" {ys[-1]:.3g}", (xs[-1], ys[-1]), color=color,
                        fontsize=8, va="center")
        ax.margins(x=0.02)
        # metrics.jsonl steps are micro-steps (host_step * grad_accum)
        ax.set_xlabel("micro-step", fontsize=8, color=TEXT2)

    handles, labels = axes.flat[0].get_legend_handles_labels()
    if len(runs) > 1:
        fig.legend(handles, labels, loc="upper right", frameon=False,
                   fontsize=9, labelcolor=TEXT)
    fig.suptitle(args.title, fontsize=12, color=TEXT, x=0.01, y=0.995,
                 ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
