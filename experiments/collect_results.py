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

    print(f"{'SNR':>4} {'ours':>10} {'ours dB':>9} {'ref':>9} {'ref dB':>8} {'delta dB':>9}")
    summary = {}
    for snr in sorted(table):
        ours = table[snr]["final_val_nmse"]
        ours_db = 10 * math.log10(ours)
        ref = REFERENCE_SNR_NMSE.get(snr)
        if ref:
            ref_db = 10 * math.log10(ref)
            delta = ours_db - ref_db
            print(f"{snr:>4} {ours:>10.4f} {ours_db:>9.2f} {ref:>9.4f} {ref_db:>8.2f} {delta:>+9.2f}")
            summary[snr] = {"ours": ours, "ref": ref, "delta_db": delta}
        else:
            print(f"{snr:>4} {ours:>10.4f} {ours_db:>9.2f} {'-':>9} {'-':>8} {'-':>9}")
            summary[snr] = {"ours": ours}

    with open(os.path.join(out_dir, "snr_table.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
