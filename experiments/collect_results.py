"""Collect experiment result JSONs into the BASELINE comparison table.

Produces the NMSE-vs-SNR table with dB deltas against the reference's A100
numbers (BASELINE.md: SNR 12/14/16/18/20 -> 0.0282/0.0188/0.0195/0.0128/0.0074
after 50-epoch fine-tunes of the pretrained model), plus any other sweeps
found under weights/.
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

REFERENCE_SNR_NMSE = {12: 0.0282, 14: 0.0188, 16: 0.0195, 18: 0.0128, 20: 0.0074}


def main(out_dir="weights"):
    rows = []
    for path in sorted(glob.glob(os.path.join(out_dir, "result_*.json"))):
        with open(path) as f:
            r = json.load(f)
        rows.append(r)

    table = {}
    for r in rows:
        snr = int(r["snr"])
        # Prefer fine-tuned entries (tag 'ft') over pretraining runs.
        is_ft = r["name"].endswith("_ft")
        if snr not in table or is_ft:
            table[snr] = r

    # The reference's table values are its logged "valid loss" = the MEAN of
    # the 5-horizon split loss (prediction-power-normalized quirk); report our
    # split-mean next to the scalar target-normalized NMSE, plus the AR-oracle
    # predictability bound of the generated data when available.
    oracle = {}
    opath = os.path.join(out_dir, "ar_oracle.json")
    if os.path.exists(opath):
        with open(opath) as f:
            oracle = {float(k): v["nmse"] for k, v in json.load(f)["snr"].items()}

    print(f"{'SNR':>4} {'ours':>8} {'split-mean':>10} {'oracle':>8} "
          f"{'ref':>8} {'delta dB':>9}")
    summary = {}
    for snr in sorted(table):
        r = table[snr]
        ours = r["final_val_nmse"]
        split_mean = (
            sum(r["final_val_split"]) / len(r["final_val_split"])
            if r.get("final_val_split") else float("nan")
        )
        orc = oracle.get(float(snr))
        ref = REFERENCE_SNR_NMSE.get(snr)
        delta = (10 * math.log10(split_mean / ref)) if ref else None
        print(f"{snr:>4} {ours:>8.4f} {split_mean:>10.4f} "
              f"{(f'{orc:.4f}' if orc else '-'):>8} "
              f"{(f'{ref:.4f}' if ref else '-'):>8} "
              f"{(f'{delta:+.2f}' if delta is not None else '-'):>9}")
        summary[snr] = {"ours": ours, "split_mean": split_mean,
                        "oracle": orc, "ref": ref, "delta_db": delta}

    with open(os.path.join(out_dir, "snr_table.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
