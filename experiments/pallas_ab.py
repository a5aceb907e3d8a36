"""Summarize the BD-kernel training A/B: the --use-pallas run vs the XLA
baseline at the identical recipe (SNR-21 calibrated row).

Reads weights/result_*_pallas_*.json + the baseline row from parity.json;
writes weights/pallas_ab.json. Pure host-side JSON munging (no TPU).
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "weights"
    pal = None
    for p in sorted(glob.glob(os.path.join(out_dir, "result_*_pallas_*.json"))):
        with open(p) as f:
            r = json.load(f)
        if "_at_full_" in r["name"] and "_21_cal" in r["name"]:
            pal = r
    if pal is None:
        print("no pallas A/B run found")
        return
    base = None
    ppath = os.path.join(out_dir, "parity.json")
    if not os.path.exists(ppath):
        ppath = "experiments/artifacts/parity.json"
    with open(ppath) as f:
        parity = json.load(f)
    row = parity["sweeps"]["snr"]["rows"].get("21")
    if row:
        base = row
    sm_pal = sum(pal["final_val_split"]) / len(pal["final_val_split"])
    res = {
        "pallas_run": pal["name"],
        "pallas_split_mean": sm_pal,
        "pallas_nmse": pal["final_val_nmse"],
        "baseline_split_mean": base["split_mean"] if base else None,
        "baseline_run": base["run"] if base else None,
        "delta_db": (
            10 * math.log10(sm_pal / base["split_mean"]) if base else None
        ),
        "note": "identical recipe (50 ep, lr 1e-3, calibrated 5 km/h, "
                "SNR 21); delta is run-to-run noise if the kernel is "
                "training-equivalent",
    }
    with open(os.path.join(out_dir, "pallas_ab.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
