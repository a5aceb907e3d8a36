"""Channel-generator calibration against the reference's committed evidence.

The reference repo ships no training datasets; the committed generator
(``GenerateDatasets/GenerateChannelsFreqPreMatlab.py:44-53``: 75-symbol slots,
1.6 kHz sampling) is inconsistent with the committed training logs — at its
normalized Doppler (fd*T = 0.49 at 30 km/h) slots decorrelate and the SNR-sweep
logs' behavior (``FullPrecision/Figures/SNR.txt``: from-scratch val NMSE 0.067
after ONE epoch, 0.0074 at 50 epochs/SNR 20) is unreachable. The generator that
produced the original datasets evidently drifted before commit.

This driver recovers the original configuration from the two observables left
in the repo, and writes the evidence to ``experiments/artifacts/calibration.json``:

1. **Slot geometry** — ``MimoSimulation/channel.pickle`` (the one stored channel
   sample, produced by ``PlotChannel.py``: one sample every 14 OFDM symbols of a
   (fft 16 + cp 6)/1.92 MHz grid -> 160.42 us slot). We compare its mean-removed
   lag-correlation curve and Hankel effective rank against our generator at the
   same geometry.

2. **UE speed** — fitted so that the per-SNR *ensemble Wiener bound* (optimal
   linear predictor of the 5 future slots from the 90 noisy past slots,
   computed in closed form from generated data) reproduces the reference's
   final SNR-sweep table. This is the strongest statistic the logs pin down:
   any dataset whose optimal-filter curve is N dB away from the table could
   not have produced it.

Usage:
    python experiments/calibrate_channel.py [--speeds 4,5,5.5,6,8,30] [--n 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup

_rt_setup()

import jax
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import generate_beamformed_dataset

REF_SNR_TABLE = {12: 0.0282, 14: 0.0188, 16: 0.0195, 18: 0.0128, 20: 0.0074}
PICKLE = "/root/reference/MimoSimulation/channel.pickle"
SLOT_PERIOD = 14.0 * (16 + 6) / (16 * 120e3)  # 160.42 us (PlotChannel.py grid)


def lag_curve(x: np.ndarray, lags=(1, 2, 3, 5, 10)) -> dict:
    """Mean-removed lag-k correlation magnitude of complex [N, T, F] data."""
    xm = x - x.mean(axis=1, keepdims=True)
    out = {}
    for k in lags:
        a = xm[:, :-k].reshape(-1)
        b = xm[:, k:].reshape(-1)
        out[k] = float(np.abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b)))
    return out


def hankel_rank(x: np.ndarray, window: int = 15, energy: float = 0.9999) -> float:
    """Mean effective rank (at ``energy`` cumulative) of per-sample Hankel
    matrices over 30-slot series — the per-window complexity statistic."""
    n, t, f = x.shape
    ranks = []
    for s in range(min(16, n)):
        hk = np.concatenate(
            [
                np.stack([x[s, i : i + window, d] for i in range(t - window + 1)], 0)
                for d in range(f)
            ],
            0,
        )
        sv = np.linalg.svd(hk, compute_uv=False)
        c = np.cumsum(sv**2) / np.sum(sv**2)
        ranks.append(int(np.searchsorted(c, energy)) + 1)
    return float(np.mean(ranks))


def generate(speed_kmh: float, n: int, t: int, seed: int = 0) -> np.ndarray:
    m = CDLModel(sampling_frequency=1.0 / SLOT_PERIOD, ue_speed_ms=speed_kmh / 3.6)
    h = np.asarray(
        generate_beamformed_dataset(
            jax.random.PRNGKey(seed), model=m, num_samples=n, num_slots=t,
            batch_size=min(n, 512),
        )
    )
    x = (h[..., 0] + 1j * h[..., 1]).reshape(n, t, -1)
    rms = np.sqrt(np.mean(np.abs(x) ** 2, axis=(1, 2), keepdims=True))
    return x / rms


def wiener_curve(x: np.ndarray, seq: int = 90) -> dict:
    """Per-SNR ensemble Wiener (optimal linear) prediction NMSE bound."""
    n = x.shape[0]
    yobs = x[:, :seq].reshape(n, -1)
    fut = x[:, seq:].reshape(n, -1)
    cyy = yobs.conj().T @ yobs / n
    cxy = fut.conj().T @ yobs / n
    ex2 = np.mean(np.abs(fut) ** 2) * fut.shape[1]
    out = {}
    for snr in REF_SNR_TABLE:
        s2 = 10 ** (-snr / 10)
        w = np.linalg.solve((cyy + s2 * np.eye(cyy.shape[0])).T, cxy.T).T
        out[snr] = float((ex2 - np.real(np.trace(w @ cxy.conj().T))) / ex2)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--speeds", type=str, default="2,4,5,5.5,6,8,15,30")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--out", type=str, default="experiments/artifacts/calibration.json")
    args = p.parse_args()

    result = {"slot_period_us": SLOT_PERIOD * 1e6, "ref_snr_table": REF_SNR_TABLE}

    # Prong 1: slot geometry vs the stored pickle.
    if os.path.exists(PICKLE):
        with open(PICKLE, "rb") as f:
            ref = np.asarray(pickle.load(f))
        refx = ref.reshape(ref.shape[0], ref.shape[1], -1)
        result["pickle_lag_curve"] = lag_curve(refx)
        result["pickle_hankel_rank"] = hankel_rank(refx)
        ours30 = generate(30.0, 64, 30, seed=1)
        result["ours_30kmh_lag_curve"] = lag_curve(ours30)
        result["ours_30kmh_hankel_rank"] = hankel_rank(ours30)

    # Prong 2: UE-speed fit against the SNR table via the Wiener bound.
    rows = {}
    best, best_cost = None, np.inf
    for v in [float(s) for s in args.speeds.split(",")]:
        x = generate(v, args.n, 95)
        curve = wiener_curve(x)
        deltas = {s: 10 * np.log10(curve[s] / REF_SNR_TABLE[s]) for s in curve}
        cost = float(np.sqrt(np.mean([d**2 for d in deltas.values()])))
        rows[str(v)] = {
            "wiener": curve,
            "delta_db": {k: round(v2, 2) for k, v2 in deltas.items()},
            "rms_delta_db": round(cost, 2),
        }
        if cost < best_cost:
            best, best_cost = v, cost
        print(f"v={v} km/h rms_delta={cost:.2f} dB {rows[str(v)]['delta_db']}")
    result["speed_grid"] = rows
    result["fitted_speed_kmh"] = best
    result["fitted_rms_delta_db"] = round(best_cost, 2)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"fitted_speed_kmh": best, "rms_delta_db": round(best_cost, 2)}))


if __name__ == "__main__":
    main()
