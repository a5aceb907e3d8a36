"""Render the reference figure set from experiment outputs.

Reference: ``PaperFigures/`` + per-experiment ``Figures/`` tooling (NMSE-vs-SNR
and NMSE-vs-horizon from loss pickles, LSQ NMSE-vs-bits, loss curves from
parsed logs). Consumes this framework's JSON/pickle/log artifacts.

No TPU/JAX required — pure NumPy + matplotlib over files on disk.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from channelestimationtransformer_tpu.utils.figures import (
    plot_loss_curves,
    plot_nmse_vs_horizon,
    plot_nmse_vs_snr,
)
from channelestimationtransformer_tpu.utils.parse_logs import parse_log_text


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir", default="weights")
    p.add_argument("--logs", nargs="*", default=[])
    p.add_argument("--out", default="figures")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    made = []

    # NMSE vs SNR from fine-tune results (result_*.json).
    snr_results = {}
    for path in glob.glob(os.path.join(args.weights_dir, "result_*.json")):
        with open(path) as f:
            r = json.load(f)
        snr_results.setdefault("informer", {})[float(r["snr"])] = r["final_val_split"]
    # Comparison suite results, if present.
    comp = os.path.join(args.weights_dir, "comparison", "comparison.json")
    if os.path.exists(comp):
        with open(comp) as f:
            for model, sweep in json.load(f).items():
                snr_results[model] = {float(k): v for k, v in sweep.items()}
    if snr_results:
        made.append(plot_nmse_vs_snr(
            snr_results, os.path.join(args.out, "nmse_vs_snr.png")))
        horizon = {
            m: sweep[max(sweep)] for m, sweep in snr_results.items()
        }
        made.append(plot_nmse_vs_horizon(
            horizon, os.path.join(args.out, "nmse_vs_horizon.png")))

    # LSQ NMSE-vs-bits (PaperFigures/LSQ equivalent).
    for name in ("lsq_results.json", "lsq_fibbinary_results.json"):
        path = os.path.join(args.weights_dir, name)
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            bits = [v["nbits"] for v in data.values()]
            nmse = [10 * np.log10(v["final_val_nmse"]) for v in data.values()]
            fig, ax = plt.subplots(figsize=(5, 3.5))
            ax.plot(bits, nmse, "s-")
            ax.set_xlabel("weight bits")
            ax.set_ylabel("NMSE [dB]")
            ax.grid(True, alpha=0.3)
            fig.tight_layout()
            out = os.path.join(args.out, name.replace(".json", ".png"))
            fig.savefig(out, dpi=150)
            made.append(out)

    # Loss curves from any text logs given.
    parsed = {}
    for logpath in args.logs:
        with open(logpath) as f:
            parsed.update(parse_log_text(f.read()))
    if parsed:
        made.append(plot_loss_curves(parsed, os.path.join(args.out, "loss_curves.png")))

    print(json.dumps({"figures": made}))


if __name__ == "__main__":
    main()
