"""Dataset generation driver.

Reference: ``GenerateDatasets/generateDataset.sbatch:12-51`` — repeats the
Sionna -> MATLAB -> pickle chain x10 to grow the dataset, appending to
``Datasets/Seq_Len_{slots}_Beamforming2_CDLB{,__validate}.pickle``.

Here the whole chain is one jitted program; this driver writes pickles in the
exact reference format (append + 80/20 split) so reference tooling can consume
them, or ``--npz`` for the framework's packed layout.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import (
    generate_beamformed_dataset,
    train_val_split,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=6400)
    p.add_argument("--num-slots", type=int, default=100)
    p.add_argument("--num-bs-ant", type=int, default=64)
    p.add_argument("--num-ut-ant", type=int, default=2)
    p.add_argument("--speed-kmh", type=float, default=30.0)
    p.add_argument("--slot-symbols", type=int, default=75)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default="Datasets")
    p.add_argument("--npz", action="store_true", help="write packed .npz instead of pickle")
    args = p.parse_args()

    model = CDLModel(
        num_bs_ant=args.num_bs_ant,
        num_ut_ant=args.num_ut_ant,
        ue_speed_ms=args.speed_kmh / 3.6,
        sampling_frequency=120e3 / args.slot_symbols,
    )
    h = generate_beamformed_dataset(
        jax.random.key(args.seed), model=model,
        num_samples=args.num_samples, num_slots=args.num_slots,
    )  # [N, slots, Nr, Nt, 2] ri
    h = np.asarray(h)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.npz:
        n, slots, nr, nt, _ = h.shape
        packed = h.reshape(n, slots, nr * nt * 2)
        train, val = train_val_split(packed)
        path = os.path.join(args.out_dir, f"Seq_Len_{args.num_slots}_Beamforming_CDLB.npz")
        np.savez(path, train=train, val=val)
        print(f"Wrote {path}: train {train.shape}, val {val.shape}")
        return

    hc = (h[..., 0] + 1j * h[..., 1]).astype(np.complex64)
    train, val = train_val_split(hc)
    for name, arr in [
        (f"Seq_Len_{args.num_slots}_Beamforming2_CDLB.pickle", train),
        (f"Seq_Len_{args.num_slots}_Beamforming2_CDLB__validate.pickle", val),
    ]:
        path = os.path.join(args.out_dir, name)
        # Append to existing data like the reference post-matlab script.
        if os.path.exists(path):
            with open(path, "rb") as f:
                existing = np.asarray(pickle.load(f))
            arr = np.concatenate([existing, arr], axis=0)
        with open(path, "wb") as f:
            pickle.dump(arr, f)
        print(f"Wrote {path}: {arr.shape}")


if __name__ == "__main__":
    main()
