"""End-to-end link simulation with the channel predictor in the loop.

Reference: ``MimoSimulation/`` (Sionna BER sim + ``Predict.py`` loading a
checkpointed InformerStack to predict 5 slots from the history),
``EndtoEndSimulation(WIP)/End2End.py`` (the unfinished merge of prediction
into the BER loop) and ``SpectralEfficiency(WIP)/NMSEvsSpectralEfficiency.py``.

This driver completes that merge: for a batch of generated channel
trajectories, the trained predictor forecasts the next ``pred_len`` effective
channels from the noisy history; the link then ZF-precodes on (a) perfect CSI,
(b) the outdated last-observed channel, and (c) the prediction, and measures
BER + spectral efficiency over an Eb/N0 sweep. Quantifies exactly what
channel-prediction quality buys at the link level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import add_channel_args, cdl_from_args
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.data.windows import make_batch
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.sim.link import (
    LinkConfig,
    simulate_ber,
    simulate_coded_ber,
)
from channelestimationtransformer_tpu.sim.precoding import (
    precoded_spectral_efficiency,
)
from channelestimationtransformer_tpu.train.checkpoint import load_checkpoint
from channelestimationtransformer_tpu.train.trainer import create_train_state


def features_to_channel(x: jnp.ndarray, nr: int, nt: int) -> jnp.ndarray:
    """Packed features ``[..., Nr*Nt*2]`` -> real-pair channel
    ``[..., Nr, Nt, 2]`` (complex stays inside the jitted sims; the axon TPU
    runtime rejects complex at executable interfaces)."""
    return x.reshape(*x.shape[:-1], nr, nt, 2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--ebno-db", type=float, nargs="+",
                   default=[-4, -2, 0, 2, 4, 6, 8, 10])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--coded", action="store_true",
                   help="coded link; the reference's LDPC-coded Sionna sim "
                        "analogue (sim/coding.py, sim/ldpc.py)")
    p.add_argument("--fec", choices=["conv", "ldpc"], default="conv",
                   help="FEC for --coded: K=7 r=1/2 conv+Viterbi, or QC-LDPC "
                        "(n=648) + min-sum BP")
    p.add_argument("--horizon", type=int, default=4,
                   help="0-based slot of the prediction horizon to evaluate")
    p.add_argument("--csi", choices=["perfect", "ls"], default="perfect",
                   help="receiver channel knowledge: genie effective channel "
                        "or pilot-based least squares (reference perfect_csi "
                        "switch, KerasFullSimulation.py:200-231)")
    p.add_argument("--domain", choices=["freq", "time"], default="freq",
                   help="flat per-subcarrier model, or the OFDM modulate -> "
                        "time channel -> demodulate branch")
    p.add_argument("--out", default="weights/e2e_results.json")
    add_channel_args(p)
    args = p.parse_args()

    cfg = InformerConfig()
    tc = TrainConfig()
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    state, _, _ = load_checkpoint(args.checkpoint, state)

    cdl = cdl_from_args(args)
    ds = make_window_dataset(
        jax.random.key(77), model=cdl, num_samples=1024, num_slots=100,
        seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
    )
    enc_in, dec_in, target = make_batch(jax.random.key(78), ds, args.batch, cfg.label_len)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, enc_in, dec_in)
    pred = out[0] if isinstance(out, tuple) else out

    h_true = features_to_channel(target[:, args.horizon], 2, 4)
    h_pred = features_to_channel(pred[:, args.horizon], 2, 4)
    h_outdated = features_to_channel(enc_in[:, -1], 2, 4)

    nmse = float(jnp.sum((h_true - h_pred) ** 2) / jnp.sum(h_true ** 2))
    print(f"Prediction NMSE at horizon {args.horizon}: {nmse:.4f} "
          f"({10 * np.log10(nmse):.2f} dB)", flush=True)

    results = {"prediction_nmse": nmse, "ebno_db": args.ebno_db, "ber": {},
               "se": {}, "coded": bool(args.coded),
               "fec": args.fec, "csi": args.csi, "domain": args.domain}
    if args.coded:
        results["bler"] = {}
    for name, h_pre in [("perfect", h_true), ("outdated", h_outdated),
                        ("predicted", h_pred)]:
        bers, blers = [], []
        for ebno in args.ebno_db:
            if args.coded:
                # LDPC frames are n=648: 162 QPSK symbols x 2 streams x 2 bps
                n_sym = 162 if args.fec == "ldpc" else 128
                ber, bler, _ = simulate_coded_ber(
                    jax.random.key(5), h_true, h_pre, float(ebno),
                    LinkConfig(qam_order=4), n_sym, fec=args.fec,
                    csi=args.csi, domain=args.domain,
                )
                blers.append(float(bler))
            else:
                ber, _ = simulate_ber(
                    jax.random.key(5), h_true, h_pre, float(ebno),
                    LinkConfig(qam_order=4), 128,
                    csi=args.csi, domain=args.domain,
                )
            bers.append(float(ber))
        se = float(jnp.mean(precoded_spectral_efficiency(h_true, h_pre, 100.0)))
        results["ber"][name] = bers
        results["se"][name] = se
        if args.coded:
            results["bler"][name] = blers
            print(f"{name}: SE {se:.2f} b/s/Hz, coded BER {bers}, BLER {blers}",
                  flush=True)
        else:
            print(f"{name}: SE {se:.2f} b/s/Hz, BER {bers}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"sweep": "e2e", "nmse": nmse}))


if __name__ == "__main__":
    main()
