#!/usr/bin/env python
"""Plot validation-PSNR curves of long training runs for the quality-ceiling
study (docs/DESIGN.md §synthetic-quality): reads the `history` dict that the
trainer stores in every checkpoint's JSON metadata.

Usage:
    python benchmarks/quality_curves.py \
        augment=outputs/long_augment/checkpoints \
        data8x=outputs/long_data/checkpoints \
        --baseline "round-1 base tiles=35.50" \
        --out docs/quality_ceiling.png

Each positional arg is ``label=checkpoint_dir``. The PNG is a single-axis
line chart (one curve per run) plus optional dashed horizontal baselines;
a JSON summary (best PSNR, best epoch, epochs-to-99%-of-best) is printed.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Validated categorical palette (fixed order, light surface).
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
INK = "#333333"
MUTED = "#767676"


def load_history(source: str) -> dict:
    # Accept either a checkpoint directory (history from the latest kept
    # checkpoint's JSON metadata — truncated at that checkpoint's epoch
    # when top-K pruning dropped later steps) or a training_history.json
    # written by scripts/train.py (always the full run).
    path = Path(source)
    if path.is_file():
        hist = json.loads(path.read_text())
        if "val_psnr" not in hist:
            raise ValueError(f"{source} is not a trainer history dict")
        return hist

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(Path(source).absolute())
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {source}")
    meta = mgr.restore(
        step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore())
    )["metadata"]
    hist = (meta or {}).get("history")
    if not hist or "val_psnr" not in hist:
        raise ValueError(f"checkpoint {source}@{step} carries no history")
    return hist


def summarize(label: str, psnr: list) -> dict:
    import numpy as np

    arr = np.asarray(psnr, dtype=float)
    best = float(arr.max())
    best_epoch = int(arr.argmax()) + 1
    # first epoch within 1% (in dB terms, 0.35 dB at 35) of the best —
    # how early the curve effectively flattens
    near = np.nonzero(arr >= best - 0.01 * best)[0]
    return {
        "run": label,
        "epochs": int(arr.size),
        "best_val_psnr_db": round(best, 3),
        "best_epoch": best_epoch,
        "first_epoch_within_1pct_of_best": int(near[0]) + 1 if near.size else None,
        "final_val_psnr_db": round(float(arr[-1]), 3),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("runs", nargs="+", help="label=checkpoint_dir")
    p.add_argument("--baseline", action="append", default=[],
                   help='horizontal reference line, "label=value_db"')
    p.add_argument("--out", default="docs/quality_ceiling.png")
    p.add_argument("--metric", default="val_psnr")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=150)
    summaries = []
    for i, spec in enumerate(args.runs):
        label, _, ckpt = spec.partition("=")
        hist = load_history(ckpt)
        y = np.asarray(hist[args.metric], dtype=float)
        x = np.arange(1, y.size + 1)
        color = SERIES[i % len(SERIES)]
        ax.plot(x, y, color=color, linewidth=1.6, label=label)
        # direct label at the curve's end: final value in neutral ink,
        # identity carried by the adjacent colored marker
        ax.annotate(f"{y[-1]:.2f} dB", (x[-1], y[-1]),
                    xytext=(6, 0), textcoords="offset points",
                    fontsize=8, color=INK, va="center")
        summaries.append(summarize(label, hist[args.metric]))

    for j, spec in enumerate(args.baseline):
        label, _, val = spec.partition("=")
        ax.axhline(float(val), color=MUTED, linewidth=1.2,
                   linestyle=(0, (4, 3)))
        ax.annotate(f"{label} ({float(val):.2f} dB)",
                    (1.0, float(val)), xycoords=("axes fraction", "data"),
                    xytext=(-4, 4), textcoords="offset points",
                    fontsize=8, color=MUTED, ha="right")

    ax.set_xlabel("epoch", fontsize=9, color=INK)
    ax.set_ylabel("validation PSNR (dB)", fontsize=9, color=INK)
    ax.tick_params(labelsize=8, colors=INK)
    ax.grid(True, color="#e6e6e6", linewidth=0.6)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(MUTED)
    if len(args.runs) > 1:
        ax.legend(fontsize=8, frameon=False, loc="lower right")
    fig.tight_layout()
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out)
    print(json.dumps({"chart": str(out), "runs": summaries}, indent=2))


if __name__ == "__main__":
    main()
