"""Collect experiment result JSONs into the full BASELINE parity table.

Covers every NMSE row of BASELINE.md: the SNR sweep (12..20) plus the six
hyperparameter sweeps (seq_len, label_len, d_ff, d_model, attn, distil) and
the LSQ study's FP32 anchor, each with dB deltas against the reference's
committed A100 numbers (``/root/reference/FullPrecision/Figures/*.txt``,
last "valid loss" per section; ``PaperFigures/LSQ/LSQ.py:44``). Emits
``snr_table.json``, ``parity.json`` and a markdown ``PARITY_RESULTS.md``
(the root ``PARITY.md`` is the component-inventory mapping).

The compared metric is the reference's logged "valid loss" = the MEAN of the
5-horizon ``NMSELossSplit`` (prediction-power-normalized quirk, SURVEY §7.4
q4) — our ``final_val_split`` mean; the scalar target-normalized NMSE is
reported alongside.

Per-cluster calibration (DESIGN.md §9 addendum, §12, and the round-4
``calibrate_fast.py`` closure): the reference's committed logs span (at
least) three mutually inconsistent datasets for the same architecture —

- **smooth**  (``dff.txt``, ``distil.txt``): ensemble Wiener bound matches
  ~3 km/h at the recovered 160.42 us slot geometry;
- **SNR**     (``SNR.txt``): matches ~5 km/h at the same geometry;
- **fast**    (``sequence_len.txt``, ``label_length.txt``, ``attn.txt``):
  matches the reference's own nominal 30 km/h mobility at the recovered
  geometry (bound(seq 90) = 0.051 at SNR 21; the committed rows sit
  1.5-2.8 dB above it, the same model-above-bound headroom the smooth
  cluster shows). No speed reproduces the curve's *shape* below seq 75
  (see ``calibration_fast.json``): on CDL-B the bound is flat in window
  length until a resolution threshold near 90 slots, so the reference's
  smooth seq-25..75 collapse is partly an optimization/capacity effect,
  not pure data predictability;
- **vfast**   (``dmodel.txt``, the LSQ FP32 anchor): rows at 0.277-0.347
  need a channel faster still; at 30 km/h the slot-symbols grid brackets
  them (``calibration_fast_ss.json``) — the cluster's slot rate is fitted
  there and encoded in ``CLUSTERS['d_model']``.

Each axis is read ONLY against runs generated at its cluster's calibration;
every row carries the per-cluster oracle (AR(30) closed-loop rollout,
``ar_oracle.py``) and, where the fast calibration provides it, the ensemble
Wiener bound — so each row reads as bound <= ours vs ref.
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
    "d_ff": "FullPrecision/Figures/dff.txt (reference log: 10 ep, "
            "inconsistent recipe; our rows: the standard 100-ep recipe)",
    "d_model": "FullPrecision/Figures/dmodel.txt (50 ep)",
    "attn": "FullPrecision/Figures/attn.txt (50 ep)",
    "distil": "FullPrecision/Figures/distil.txt (50 ep)",
}
REF_LSQ_FP32_H5 = 0.3466  # PaperFigures/LSQ/LSQ.py:44 (5th-horizon loss)

BASE = dict(seq_len=90, label_len=10, d_model=128, d_ff=64, attn="full",
            distil="on")

# Cluster assignment per axis (see module docstring). "cal" clusters are
# runs at CDLModel.calibrated(speed) (run names tagged ``_cal_v<speed>``);
# the "ss" cluster is the nominal 30 km/h at a fitted slot-symbols rate
# (names tagged ``_ss<n>``).
CLUSTERS = {
    "snr": dict(cal=True, speed=5.0),
    "d_ff": dict(cal=True, speed=3.0),
    "distil": dict(cal=True, speed=3.0),
    "seq_len": dict(cal=True, speed=30.0),
    "label_len": dict(cal=True, speed=30.0),
    "attn": dict(cal=True, speed=30.0),
    # vfast: fitted on calibration_fast_ss.json — at 30-symbol slots the
    # LSQ FP32 anchor sits ON the bound (+0.06 dB) and the dmodel rows are
    # feasible; 33-symbol slots already put the anchor 1.25 dB below bound
    # (infeasible).
    "d_model": dict(cal=False, ss=30),
}

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


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
    ss = re.search(r"_ss(\d+)", name)
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
        ss=int(ss.group(1)) if ss else (14 if "_cal" in name else 75),
    )


def in_cluster(fields: dict, axis: str) -> bool:
    spec = CLUSTERS[axis]
    if spec["cal"]:
        return fields["calibrated"] and fields["speed"] == spec["speed"]
    return (not fields["calibrated"] and fields["ss"] == spec["ss"]
            and fields["speed"] == 30.0)


def run_in_cluster(run_name: str, axis: str) -> bool:
    f = parse_name(str(run_name))
    return bool(f) and in_cluster(f, axis)


def split_mean(r: dict) -> float:
    s = r.get("final_val_split")
    return sum(s) / len(s) if s else float("nan")


def delta_db(ours, ref):
    if ref is None or not ours or math.isnan(ours):
        return None
    return 10 * math.log10(ours / ref)


def _load(path):
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


class Bounds:
    """Per-cluster oracle (AR rollout) + ensemble Wiener bound lookups from
    the committed calibration artifacts."""

    def __init__(self, art_dir: str):
        self.a = art_dir
        self._cache = {}
        self.cal_fast = _load(os.path.join(art_dir, "calibration_fast.json"))
        self.cal_ss = _load(os.path.join(art_dir, "calibration_fast_ss.json"))

    def _oracle_file(self, name):
        if name not in self._cache:
            self._cache[name] = _load(os.path.join(self.a, name))
        return self._cache[name]

    def oracle(self, axis: str, val, snr) -> float | None:
        spec = CLUSTERS[axis]
        if spec["cal"] and spec["speed"] == 5.0:
            name = "ar_oracle_cal_v5.json"
        elif spec["cal"] and spec["speed"] == 3.0:
            name = "ar_oracle_cal_v3.json"
        elif spec["cal"]:
            sl = val if axis == "seq_len" else 90
            name = f"ar_oracle_cal_v30_sl{sl}.json"
        else:
            name = f"ar_oracle_ss{spec['ss']}.json"
        d = self._oracle_file(name)
        if not d:
            return None
        row = d["snr"].get(str(float(snr)))
        if not row:
            return None
        return sum(row["split"]) / len(row["split"])

    def wiener(self, axis: str, val) -> float | None:
        if axis in ("seq_len", "label_len", "attn") and self.cal_fast:
            grid = self.cal_fast.get("speed_grid", {}).get("30.0")
            if grid:
                sl = str(val) if axis == "seq_len" else "90"
                return grid["bound_seq"].get(sl)
        if axis == "d_model" and self.cal_ss:
            row = self.cal_ss.get("slot_symbols_grid", {}).get(
                str(CLUSTERS["d_model"]["ss"]))
            if row:
                return row.get("bound_seq90")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="weights")
    ap.add_argument("--tag", default="r2cos",
                    help="preferred result tag for the SNR table")
    ap.add_argument("--art", default=ART,
                    help="artifacts dir holding calibration/oracle JSONs")
    ap.add_argument("--base", default=None,
                    help="previous parity.json whose rows fill in any sweep "
                         "value with no fresh result (e.g. the committed "
                         "experiments/artifacts/parity.json)")
    ap.add_argument("--ci", default=os.path.join(ART, "parity_ci.json"),
                    help="bootstrap-CI artifact (eval_parity_ci.py); merged "
                         "as a CI column when present")
    args = ap.parse_args()

    bounds = Bounds(args.art)

    results = []
    for path in sorted(glob.glob(os.path.join(args.out_dir, "result_*.json"))):
        with open(path) as f:
            r = json.load(f)
        fields = parse_name(r["name"])
        if fields:
            r["_fields"] = fields
            results.append(r)

    # Parity rows come from the standard XLA-path f32 recipe; kernel/dtype
    # A/B runs (name suffixes "_pallas"/"_bf16"/"_rbg") are compared in their
    # own artifacts, not here.
    AB_TOKENS = ("_pallas", "_bf16", "_rbg")
    usable = [r for r in results
              if not any(t in r["name"] for t in AB_TOKENS)]

    def at_base(r, axis):
        f = r["_fields"]
        for k, v in BASE.items():
            if k == axis:
                continue
            if f[k] != v:
                return False
        return True

    parity = {"metric": "mean NMSELossSplit over 5 horizons ('valid loss'); "
                        "oracle = per-cluster AR(30) rollout split-mean; "
                        "wiener = ensemble Wiener bound (calibrate_fast)",
              "clusters": CLUSTERS,
              "sweeps": {}}

    # --- SNR sweep ---
    snr_rows = {}
    for r in usable:
        f = r["_fields"]
        if not in_cluster(f, "snr"):
            continue
        if not at_base(r, None) or (f["snr"] not in REFERENCE["snr"]
                                    and f["snr"] != 21):
            continue
        tagged = args.tag in r["name"]
        cur = snr_rows.get(f["snr"])
        if cur is None or (tagged and args.tag not in cur["name"]):
            snr_rows[f["snr"]] = r

    snr_table = {}
    for snr in sorted(snr_rows):
        r = snr_rows[snr]
        sm = split_mean(r)
        ref = REFERENCE["snr"].get(snr)
        snr_table[str(snr)] = {
            "ours": r["final_val_nmse"],
            "split_mean": sm,
            "oracle": bounds.oracle("snr", snr, snr),
            "ref": ref,
            "delta_db": delta_db(sm, ref),
            "run": r["name"],
        }
    parity["sweeps"]["snr"] = {"ref_source": REF_SOURCES["snr"],
                               "cluster": CLUSTERS["snr"],
                               "rows": snr_table}

    # --- hyperparameter sweeps ---
    for axis in ("seq_len", "label_len", "d_ff", "d_model", "attn", "distil"):
        rows = {}
        for r in usable:
            f = r["_fields"]
            if not in_cluster(f, axis):
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
                "oracle": bounds.oracle(axis, val, 21),
                "wiener": bounds.wiener(axis, val),
                "ref": ref,
                "delta_db": delta_db(sm, ref),
                "run": r["name"],
            }
        parity["sweeps"][axis] = {
            "ref_source": REF_SOURCES[axis],
            "cluster": CLUSTERS[axis],
            "rows": table,
        }

    # --- LSQ FP32 anchor (5th-horizon loss at the flagship config on the
    # vfast cluster; PaperFigures/LSQ/LSQ.py:44 plots arr.flatten()[4]) ---
    anchor = None
    for r in usable:
        f = r["_fields"]
        if in_cluster(f, "d_model") and at_base(r, None) and f["snr"] == 21:
            s = r.get("final_val_split")
            if s and len(s) == 5:
                anchor = {"ours_h5": s[4],
                          "ref": REF_LSQ_FP32_H5,
                          "delta_db": delta_db(s[4], REF_LSQ_FP32_H5),
                          "run": r["name"]}
    parity["lsq_fp32_anchor"] = {
        "ref_source": "PaperFigures/LSQ/LSQ.py:44 (FP32 axhline, 5th horizon)",
        "cluster": CLUSTERS["d_model"],
        "row": anchor,
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
                    # calibration (geometry is encoded in the run name).
                    if not run_in_cluster(row.get("run", ""), axis):
                        continue
                    if row.get("oracle") is None:
                        v = int(val) if str(val).isdigit() else val
                        row = dict(row, oracle=bounds.oracle(
                            axis, v, 21 if axis != "snr" else v))
                    ours["rows"][val] = dict(row, carried_from_base=True)

    # --- merge bootstrap CIs (eval_parity_ci.py; VERDICT r4 item 8) ---
    ci_art = _load(args.ci)
    if ci_art:
        for axis, block in parity["sweeps"].items():
            for val, row in block.get("rows", {}).items():
                ci = ci_art.get("rows", {}).get(f"{axis}:{val}")
                if ci and "mean" in ci:
                    row["ci"] = {
                        "n_batches": ci["n"],
                        "mean64": ci["mean"],
                        "ci95": ci["ci95"],
                        "delta_db_ci95": ci.get("delta_db_ci95"),
                        "excludes_zero": ci.get("excludes_zero"),
                        "checkpoint_epoch": ci.get("checkpoint_epoch"),
                    }

    with open(os.path.join(args.out_dir, "snr_table.json"), "w") as f:
        json.dump(parity["sweeps"]["snr"]["rows"], f, indent=2)
    with open(os.path.join(args.out_dir, "parity.json"), "w") as f:
        json.dump(parity, f, indent=2)

    # --- markdown ---
    lines = ["# Parity vs reference (per-cluster calibrated channel)", "",
             f"Metric: {parity['metric']}. delta_db = 10*log10(ours/ref); "
             "negative = we beat the reference. 'oracle' / 'wiener' are the "
             "cluster's own predictability bounds (every row reads as "
             "bound <= ours vs ref). The CI column is a percentile bootstrap "
             "(10k resamples) over 64 independent 256-window validation "
             "batches re-evaluated from the row's checkpoint "
             "(eval_parity_ci.py); point estimates remain the training run's "
             "final 8-batch validation.", ""]
    for axis, block in parity["sweeps"].items():
        spec = block.get("cluster", {})
        cal = (f" — runs at the {spec['speed']:g} km/h cluster calibration"
               if spec.get("cal") else
               f" — runs at 30 km/h, {spec.get('ss')}-symbol slots"
               if spec else "")
        lines.append(f"## {axis}  \n_source: {block['ref_source']}{cal}_\n")
        lines.append("| value | bound (wiener/oracle) | ours (split-mean) "
                     "| ref | delta dB | delta dB 95% CI (64 batches) |")
        lines.append("|---|---|---|---|---|---|")
        for val, row in sorted(block["rows"].items(),
                               key=lambda kv: (len(str(kv[0])), str(kv[0]))):
            d = row["delta_db"]
            w = row.get("wiener")
            o = row.get("oracle")
            b = " / ".join(f"{x:.4f}" for x in (w, o) if x is not None) or "-"
            ci = row.get("ci")
            if ci and ci.get("delta_db_ci95"):
                lo, hi = ci["delta_db_ci95"]
                mark = ("" if ci.get("excludes_zero")
                        else " (CI touches 0 — inconclusive)")
                ci_s = f"[{lo:+.2f}, {hi:+.2f}]{mark}"
            else:
                ci_s = "-"
            lines.append(
                f"| {val} | {b} | {row['split_mean']:.5f} | "
                f"{row['ref'] if row['ref'] is not None else '-'} | "
                f"{f'{d:+.2f}' if d is not None else '-'} | {ci_s} |")
        lines.append("")
    if anchor:
        lines.append("## LSQ FP32 anchor (5th horizon)\n")
        lines.append(f"ours {anchor['ours_h5']:.4f} vs ref "
                     f"{anchor['ref']} ({anchor['delta_db']:+.2f} dB) — "
                     f"run `{anchor['run']}`\n")
    md = "\n".join(lines)
    with open(os.path.join(args.out_dir, "PARITY_RESULTS.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
