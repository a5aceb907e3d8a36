"""Bootstrap confidence intervals for the committed parity rows (VERDICT r4 §8).

The parity table's point estimates come from each training run's final
validation (8 batches = 2,048 windows). This driver re-evaluates every row
whose checkpoint is on disk on ``--batches`` (default 64) independent
validation batches — 16,384 windows, fresh noise draws — regenerating the
run's own validation dataset (same cluster calibration, same seed protocol as
``train_informer.py``), and attaches a bootstrap CI to the per-row NMSE and
to its dB delta against the reference.

Metric per batch: mean of the 5-horizon ``NMSELossSplit`` (the reference's
logged "valid loss"). CI: percentile bootstrap (10k resamples) over the
per-batch values.

Output: ``experiments/artifacts/parity_ci.json``; ``collect_results.py --ci``
merges the CI column into PARITY_RESULTS.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from collect_results import CLUSTERS, REFERENCE, parse_name
from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.train.checkpoint import load_checkpoint
from channelestimationtransformer_tpu.train.trainer import (
    create_train_state,
    eval_step_impl,
)


@partial(jax.jit, static_argnames=("num_batches", "batch_size", "label_len",
                                   "seq_len", "pred_len"))
def eval_batches(state, dataset_h, rng, *, num_batches, batch_size, label_len,
                 seq_len, pred_len, snr_db):
    """Per-batch split-mean values (eval_chunk without the final mean)."""

    def body(carry, i):
        m = eval_step_impl(
            state, dataset_h, jax.random.fold_in(rng, i),
            batch_size=batch_size, label_len=label_len,
            seq_len=seq_len, pred_len=pred_len, snr_db=snr_db,
        )
        return carry, (jnp.mean(m["split"]), m["split"])

    _, (vals, splits) = jax.lax.scan(body, None, jnp.arange(num_batches))
    return vals, splits


def bootstrap_ci(vals: np.ndarray, n_boot: int = 10_000, seed: int = 0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(vals), size=(n_boot, len(vals)))
    means = vals[idx].mean(axis=1)
    return float(np.percentile(means, 2.5)), float(np.percentile(means, 97.5))


def cdl_for_cluster(spec: dict) -> CDLModel:
    if spec["cal"]:
        return CDLModel.calibrated(ue_speed_kmh=spec["speed"])
    return CDLModel(sampling_frequency=120e3 / spec["ss"], ue_speed_ms=30 / 3.6)


def cfg_from_fields(f: dict, run_name: str) -> InformerConfig:
    return InformerConfig(
        seq_len=f["seq_len"], label_len=f["label_len"],
        d_model=f["d_model"], d_ff=f["d_ff"], attn=f["attn"],
        distil=(f["distil"] == "on"),
    )


def find_checkpoint(weights_dir: str, run_name: str):
    # glob.escape: run names contain "el_[4, 3]" which glob reads as a
    # character class otherwise.
    cands = glob.glob(
        os.path.join(glob.escape(weights_dir),
                     glob.escape(f"tmodel_{run_name}_") + "*.msgpack")
    )
    best, best_ep = None, -1
    for c in cands:
        m = re.search(r"_(\d+)\.msgpack$", c)
        if m and int(m.group(1)) > best_ep:
            best, best_ep = c, int(m.group(1))
    return best, best_ep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", default="experiments/artifacts/parity.json")
    ap.add_argument("--weights", default="weights")
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--val-samples", type=int, default=2048)
    ap.add_argument("--out", default="experiments/artifacts/parity_ci.json")
    args = ap.parse_args()

    with open(args.parity) as f:
        parity = json.load(f)

    # Cache datasets per (cluster, seq/pred, snr) and states per config.
    ds_cache = {}
    out = {"batches": args.batches,
           "windows": args.batches * 256,
           "method": "percentile bootstrap, 10k resamples over per-batch "
                     "split-mean values; val set regenerated at the run's "
                     "cluster calibration (train_informer seed protocol)",
           "rows": {}}

    def eval_run(run_name: str, axis: str, snr: float):
        fields = parse_name(run_name)
        if not fields:
            return {"error": "unparseable run name"}
        ckpt, ep = find_checkpoint(args.weights, run_name)
        if not ckpt:
            return {"error": "no checkpoint on disk"}
        spec = CLUSTERS[axis]
        cfg = cfg_from_fields(fields, run_name)
        tc = TrainConfig()
        model = build_informer(cfg)
        state = create_train_state(model, rng=jax.random.key(0), cfg=cfg,
                                   train_cfg=tc)
        state, _, _ = load_checkpoint(ckpt, state)

        ds_key = (json.dumps(spec, sort_keys=True), cfg.seq_len, cfg.pred_len,
                  snr)
        if ds_key not in ds_cache:
            # train_informer.py: key(seed+100) -> (k1 train, k2 val).
            _, k2 = jax.random.split(jax.random.key(100))
            ds_cache[ds_key] = make_window_dataset(
                k2, model=cdl_for_cluster(spec),
                num_samples=args.val_samples, num_slots=100,
                seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=snr,
            )
        ds = ds_cache[ds_key]
        vals, _ = eval_batches(
            state, ds.h, jax.random.key(4242),
            num_batches=args.batches, batch_size=256,
            label_len=cfg.label_len, seq_len=cfg.seq_len,
            pred_len=cfg.pred_len, snr_db=snr,
        )
        vals = np.asarray(vals, np.float64)
        lo, hi = bootstrap_ci(vals)
        return {"checkpoint_epoch": ep, "n": len(vals),
                "mean": float(vals.mean()),
                "ci95": [lo, hi],
                "per_batch_std": float(vals.std(ddof=1))}

    for axis, block in parity.get("sweeps", {}).items():
        for val, row in block.get("rows", {}).items():
            run = row.get("run")
            ref = row.get("ref")
            if not run:
                continue
            snr = float(val) if axis == "snr" else 21.0
            res = eval_run(run, axis, snr)
            if ref and "mean" in res:
                res["ref"] = ref
                res["delta_db"] = float(10 * np.log10(res["mean"] / ref))
                res["delta_db_ci95"] = [
                    float(10 * np.log10(res["ci95"][0] / ref)),
                    float(10 * np.log10(res["ci95"][1] / ref)),
                ]
                res["excludes_zero"] = res["delta_db_ci95"][1] < 0.0
            out["rows"][f"{axis}:{val}"] = res
            print(json.dumps({f"{axis}:{val}": res}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    n_ok = sum(1 for r in out["rows"].values() if "mean" in r)
    print(f"wrote {args.out}: {n_ok}/{len(out['rows'])} rows evaluated")


if __name__ == "__main__":
    main()
