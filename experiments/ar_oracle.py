"""AR(p) predictability oracle: the data-driven NMSE bound for a dataset.

For every evaluation window this fits a per-window complex AR(p) predictor on
the *noisy* history by ridge least squares and rolls it out closed-loop for
``pred_len`` slots, scoring against the clean future — i.e., the best a
memory-p linear predictor could do on exactly the task the transformer solves.

Why it exists: the reference's stored channel pickle is almost perfectly
AR-predictable (lag-1 corr 0.883, AR(10) NMSE ~2e-11 — ROADMAP.md), so its
headline NMSE numbers say as much about the data as the model. This oracle
quantifies the predictability of *our* generated physics per (slot-symbols,
SNR) so model NMSE can be reported as "fraction of the linear-predictability
bound" rather than against a dataset we don't have.

Runs on CPU (complex lstsq; analysis tool, not a training path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import cdl_from_args
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.data.windows import sample_windows


def ar_oracle_nmse(
    noisy_hist: np.ndarray, clean_future: np.ndarray, order: int, ridge: float = 1e-3
):
    """Per-window complex AR(order) fit + closed-loop rollout.

    noisy_hist: [B, L, F] packed ri features; clean_future: [B, P, F].
    Returns (scalar NMSE, per-horizon NMSE [P]).
    """
    b, l, f = noisy_hist.shape
    p_len = clean_future.shape[1]
    # packed ri -> complex [B, L, C]
    x = noisy_hist.reshape(b, l, f // 2, 2)
    x = (x[..., 0] + 1j * x[..., 1]).transpose(0, 2, 1).reshape(b * (f // 2), l)
    y = clean_future.reshape(b, p_len, f // 2, 2)
    y = (y[..., 0] + 1j * y[..., 1]).transpose(0, 2, 1).reshape(b * (f // 2), p_len)

    n_rows = l - order
    idx = np.arange(order)[None, :] + np.arange(n_rows)[:, None]  # [rows, order]
    preds = np.empty_like(y)
    for i in range(x.shape[0]):
        s = x[i]
        a_mat = s[idx]  # [rows, order], lags oldest->newest
        b_vec = s[order:]
        # ridge LS: (A^H A + eI) w = A^H b
        g = a_mat.conj().T @ a_mat + ridge * np.eye(order)
        w = np.linalg.solve(g, a_mat.conj().T @ b_vec)
        hist = list(s[-order:])
        for t in range(p_len):
            nxt = np.dot(np.asarray(hist[-order:]), w)
            preds[i, t] = nxt
            hist.append(nxt)
    err = np.abs(preds - y) ** 2
    pwr = np.abs(y) ** 2
    scalar = float(err.sum() / pwr.sum())
    split = err.reshape(b, f // 2, p_len).sum(axis=(0, 1)) / pwr.reshape(
        b, f // 2, p_len
    ).sum(axis=(0, 1))
    return scalar, [float(v) for v in split]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snr", type=float, nargs="+", default=[12, 21])
    p.add_argument("--slot-symbols", type=int, default=14)
    p.add_argument("--ue-speed-kmh", type=float, default=None)
    p.add_argument("--calibrated", action="store_true",
                   help="use CDLModel.calibrated() (parity configuration)")
    p.add_argument("--order", type=int, default=30)
    p.add_argument("--windows", type=int, default=256)
    p.add_argument("--seq-len", type=int, default=90)
    p.add_argument("--pred-len", type=int, default=5)
    p.add_argument("--out", default="weights/ar_oracle.json")
    args = p.parse_args()

    results = {
        "order": args.order, "slot_symbols": args.slot_symbols,
        "calibrated": bool(args.calibrated),
        "ue_speed_kmh": args.ue_speed_kmh,
        "seq_len": args.seq_len,
        "snr": {},
    }
    for snr in args.snr:
        ds = make_window_dataset(
            jax.random.key(1234),
            model=cdl_from_args(args),
            num_samples=1024, num_slots=100,
            seq_len=args.seq_len, pred_len=args.pred_len, snr_db=snr,
        )
        _, _, hist, future = sample_windows(
            jax.random.key(5678), ds, args.windows
        )
        scalar, split = ar_oracle_nmse(
            np.asarray(hist), np.asarray(future), args.order
        )
        results["snr"][str(snr)] = {
            "nmse": scalar,
            "nmse_db": float(10 * np.log10(scalar)),
            "split": split,
        }
        print(json.dumps({"snr": snr, "oracle_nmse": scalar,
                          "oracle_db": round(10 * np.log10(scalar), 2),
                          "split": [round(v, 5) for v in split]}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
