"""Collect experiment result JSONs into the full BASELINE parity table.

Covers every NMSE row of BASELINE.md: the SNR sweep (12..20) plus the six
hyperparameter sweeps (seq_len, label_len, d_ff, d_model, attn, distil),
each with dB deltas against the reference's committed A100 numbers
(``/root/reference/FullPrecision/Figures/*.txt``, last "valid loss" per
section). Emits ``snr_table.json``, ``parity.json`` and a markdown
``PARITY_RESULTS.md`` (the root ``PARITY.md`` is the component-inventory
mapping).

The compared metric is the reference's logged "valid loss" = the MEAN of the
5-horizon ``NMSELossSplit`` (prediction-power-normalized quirk, SURVEY §7.4
q4) — our ``final_val_split`` mean; the scalar target-normalized NMSE is
reported alongside.

Caveat recorded in the output: several reference sweep sections are mutually
inconsistent for the *same* nominal config (e.g. ``dmodel.txt`` ends at
0.277 for the exact architecture whose ``SNR.txt`` section ends at 0.0074,
and ``dff.txt`` is a 10-epoch run where the others are 50-100 epochs), so
per-row deltas against those sections measure recipe drift in the reference,
not model quality; the self-consistent rows are the SNR table, seq_len,
attn and distil.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re

REFERENCE = {
    "snr": {12: 0.0282, 14: 0.0188, 16: 0.0195, 18: 0.0128, 20: 0.0074},
    "seq_len": {25: 0.349, 50: 0.177, 75: 0.102, 90: 0.080},
    "label_len": {5: 0.0722, 10: 0.0853, 15: 0.0820, 20: 0.0716},
    "d_ff": {64: 0.0037, 96: 0.0047, 128: 0.0030, 192: 0.0041, 256: 0.0107},
    "d_model": {64: 0.326, 96: 0.302, 128: 0.277},
    "attn": {"full": 0.0964, "prob": 0.1463},
    "distil": {"on": 0.0035, "off": 0.0049},
}
REF_SOURCES = {
    "snr": "FullPrecision/Figures/SNR.txt (50 ep, lr 1e-3 constant)",
    "seq_len": "FullPrecision/Figures/sequence_len.txt (100 ep)",
    "label_len": "FullPrecision/Figures/label_length.txt (100 ep)",
    "d_ff": "FullPrecision/Figures/dff.txt (10 ep — inconsistent recipe)",
    "d_model": "FullPrecision/Figures/dmodel.txt (50 ep — inconsistent with SNR.txt)",
    "attn": "FullPrecision/Figures/attn.txt (50 ep)",
    "distil": "FullPrecision/Figures/distil.txt (50 ep)",
}

BASE = dict(seq_len=90, label_len=10, d_model=128, d_ff=64, attn="full",
            distil="on")

# Per-cluster calibration (DESIGN.md §9 addendum): the reference's committed
# logs span two mutually inconsistent datasets for the same architecture. The
# SNR/seq_len/label_len/attn campaign matches the ~5 km/h calibration; the
# d_ff/distil campaign sits on a smoother channel whose ensemble Wiener bound
# at SNR 21 (0.0023) matches ~3 km/h at the recovered slot geometry. Each
# axis is read against runs generated at its cluster's calibration.
CLUSTER_SPEED = {
    "snr": 5.0, "seq_len": 5.0, "label_len": 5.0, "d_model": 5.0,
    "attn": 5.0, "d_ff": 3.0, "distil": 3.0,
}


def parse_name(name: str) -> dict:
    m = re.search(
        r"sl_(\d+)_ll_(\d+)_pl_(\d+)_f_\d+_dm_(\d+)_nh_\d+_el_\[[^\]]*\]"
        r"_dl_\d+_df_(\d+)_do_[\d.]+_at_(\w+?)_em_fixed_ac_gelu_(\d+)",
        name,
    )
    if not m:
        return {}
    # Anchor the speed to the calibration tag (``_cal_v5``); a run name with
    # an unrelated earlier ``_v...`` token must not win. Fall back to the
    # *last* bare ``_v`` token for non-calibrated explicit-speed runs.
    cal = re.search(r"_cal_v(\d+(?:\.\d+)?)", name)
    bare = re.findall(r"_v(\d+(?:\.\d+)?)(?=_|$)", name)
    if cal:
        speed = float(cal.group(1))
    elif bare:
        speed = float(bare[-1])
    else:
        speed = 5.5 if "_cal" in name else 30.0
    return dict(
        seq_len=int(m.group(1)),
        label_len=int(m.group(2)),
        d_model=int(m.group(4)),
        d_ff=int(m.group(5)),
        attn=m.group(6),
        snr=int(m.group(7)),
        distil="off" if "_nodistil" in name else "on",
        calibrated="_cal" in name,
        speed=speed,
    )


def split_mean(r: dict) -> float:
    s = r.get("final_val_split")
    return sum(s) / len(s) if s else float("nan")


def delta_db(ours, ref):
    if ref is None or not ours or math.isnan(ours):
        return None
    return 10 * math.log10(ours / ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="weights")
    ap.add_argument("--tag", default="r2cos",
                    help="preferred result tag for the SNR table")
    ap.add_argument("--oracle", default=None,
                    help="ar_oracle.json path for the predictability column")
    ap.add_argument("--base", default=None,
                    help="previous parity.json whose rows fill in any sweep "
                         "value with no fresh result (e.g. the committed "
                         "experiments/artifacts/parity.json)")
    args = ap.parse_args()

    results = []
    for path in sorted(glob.glob(os.path.join(args.out_dir, "result_*.json"))):
        with open(path) as f:
            r = json.load(f)
        fields = parse_name(r["name"])
        if fields:
            r["_fields"] = fields
            results.append(r)

    # Parity rows come from the standard XLA-path recipe; kernel-A/B runs
    # (name suffix "_pallas") are compared in their own artifact, not here.
    cal = [r for r in results
           if r["_fields"]["calibrated"] and "_pallas" not in r["name"]]

    def at_base(r, axis):
        f = r["_fields"]
        for k, v in BASE.items():
            if k == axis:
                continue
            if f[k] != v:
                return False
        return True

    parity = {"metric": "mean NMSELossSplit over 5 horizons ('valid loss')",
              "sweeps": {}}

    # --- SNR sweep ---
    snr_rows = {}
    for r in cal:
        f = r["_fields"]
        if f["speed"] != CLUSTER_SPEED["snr"]:
            continue
        if not at_base(r, None) or f["snr"] not in REFERENCE["snr"] and f["snr"] != 21:
            continue
        tagged = args.tag in r["name"]
        cur = snr_rows.get(f["snr"])
        if cur is None or (tagged and args.tag not in cur["name"]):
            snr_rows[f["snr"]] = r

    oracle = {}
    opath = args.oracle or os.path.join(args.out_dir, "ar_oracle.json")
    if os.path.exists(opath):
        with open(opath) as f:
            oracle = {float(k): v["nmse"] for k, v in json.load(f)["snr"].items()}

    snr_table = {}
    for snr in sorted(snr_rows):
        r = snr_rows[snr]
        sm = split_mean(r)
        ref = REFERENCE["snr"].get(snr)
        snr_table[str(snr)] = {
            "ours": r["final_val_nmse"],
            "split_mean": sm,
            "oracle": oracle.get(float(snr)),
            "ref": ref,
            "delta_db": delta_db(sm, ref),
            "run": r["name"],
        }
    parity["sweeps"]["snr"] = {"ref_source": REF_SOURCES["snr"],
                               "cluster_speed_kmh": CLUSTER_SPEED["snr"],
                               "rows": snr_table}

    # --- hyperparameter sweeps ---
    for axis in ("seq_len", "label_len", "d_ff", "d_model", "attn", "distil"):
        rows = {}
        for r in cal:
            f = r["_fields"]
            if f["speed"] != CLUSTER_SPEED[axis]:
                continue
            if f["snr"] != 21 or not at_base(r, axis):
                continue
            val = f[axis]
            if val not in REFERENCE[axis]:
                continue
            cur = rows.get(val)
            if cur is None or r["name"] > cur["name"]:
                rows[val] = r
        table = {}
        for val, r in rows.items():
            sm = split_mean(r)
            ref = REFERENCE[axis][val]
            table[str(val)] = {
                "ours": r["final_val_nmse"],
                "split_mean": sm,
                "ref": ref,
                "delta_db": delta_db(sm, ref),
                "run": r["name"],
            }
        parity["sweeps"][axis] = {
            "ref_source": REF_SOURCES[axis],
            "cluster_speed_kmh": CLUSTER_SPEED[axis],
            "rows": table,
        }

    # --- fill gaps from a previous round's parity.json (fresh runs win) ---
    if args.base and os.path.exists(args.base):
        with open(args.base) as f:
            base = json.load(f)
        for axis, block in base.get("sweeps", {}).items():
            ours = parity["sweeps"].setdefault(
                axis, {"ref_source": REF_SOURCES.get(axis, "?"), "rows": {}}
            )
            for val, row in block.get("rows", {}).items():
                if val not in ours["rows"]:
                    # Only carry rows generated at this axis' cluster
                    # calibration (speed is encoded in the run name).
                    sp = re.search(r"_cal_v(\d+(?:\.\d+)?)",
                                   str(row.get("run", "")))
                    if sp and float(sp.group(1)) != CLUSTER_SPEED.get(axis, 5.0):
                        continue
                    ours["rows"][val] = dict(row, carried_from_base=True)

    with open(os.path.join(args.out_dir, "snr_table.json"), "w") as f:
        json.dump(parity["sweeps"]["snr"]["rows"], f, indent=2)
    with open(os.path.join(args.out_dir, "parity.json"), "w") as f:
        json.dump(parity, f, indent=2)

    # --- markdown ---
    lines = ["# Parity vs reference (calibrated channel)", "",
             f"Metric: {parity['metric']}. delta_db = 10*log10(ours/ref); "
             "negative = we beat the reference.", ""]
    for axis, block in parity["sweeps"].items():
        spd = block.get("cluster_speed_kmh")
        cal = f" — runs at the {spd:g} km/h cluster calibration" if spd else ""
        lines.append(f"## {axis}  \n_source: {block['ref_source']}{cal}_\n")
        lines.append("| value | ours (split-mean) | ref | delta dB |")
        lines.append("|---|---|---|---|")
        for val, row in sorted(block["rows"].items(),
                               key=lambda kv: (len(str(kv[0])), str(kv[0]))):
            d = row["delta_db"]
            lines.append(
                f"| {val} | {row['split_mean']:.5f} | "
                f"{row['ref'] if row['ref'] is not None else '-'} | "
                f"{f'{d:+.2f}' if d is not None else '-'} |")
        lines.append("")
    md = "\n".join(lines)
    with open(os.path.join(args.out_dir, "PARITY_RESULTS.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
