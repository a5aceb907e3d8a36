"""Sweep runner: the FullPrecision sbatch sweeps as one driver.

Reference: ``FullPrecision/{SNR,seq_len,dff,dmodel,attn,distil,label_len}.sbatch``
— each fans out repeated trainer invocations with one hyperparameter varied;
logs land in ``Figures/*.txt`` and are regex-parsed into the thesis figures.

Usage:
    python experiments/sweep.py snr        # SNR 12..21 (the headline sweep)
    python experiments/sweep.py seq_len    # 25/50/75/90
    python experiments/sweep.py d_ff       # 64/96/128/192/256
    ...

Each run reuses ``train_informer.main`` in-process (one TPU program cache) and
appends to a combined, reference-parseable log.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SWEEPS = {
    # reference FullPrecision/SNR.sbatch
    "snr": [["--snr", str(v)] for v in (12, 14, 16, 18, 20, 21)],
    # reference sequence_len sweep (sbatch mislabeled "Dff", SURVEY §5.6)
    "seq_len": [["--seq-len", str(v)] for v in (25, 50, 75, 90)],
    "label_len": [["--label-len", str(v)] for v in (5, 10, 15, 20)],
    "d_ff": [["--d-ff", str(v)] for v in (64, 96, 128, 192, 256)],
    "d_model": [["--d-model", str(v)] for v in (64, 96, 128)],
    "attn": [["--attn", v] for v in ("full", "prob")],
    "distil": [[], ["--no-distil"]],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sweep", choices=sorted(SWEEPS))
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--train-samples", type=int, default=65536)
    p.add_argument("--log", default=None)
    # Unrecognized flags are forwarded verbatim (in order) to train_informer.
    # NOTE: no positional catch-all — argparse would strip flag *values* out
    # of the unknown list ("--ue-speed-kmh 5" -> positional "5" + unknown
    # "--ue-speed-kmh"), scrambling the forwarded command.
    args, unknown = p.parse_known_args()
    args.extra = unknown

    log_path = args.log or os.path.join("weights", f"sweep_{args.sweep}.txt")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)

    for variant in SWEEPS[args.sweep]:
        cmd = [
            sys.executable, os.path.join(HERE, "train_informer.py"),
            "--epochs", str(args.epochs),
            "--train-samples", str(args.train_samples),
            *variant, *args.extra,
        ]
        print(f"=== {' '.join(cmd)} ===", flush=True)
        with open(log_path, "a") as logf:
            subprocess.run(cmd, stdout=logf, stderr=subprocess.STDOUT, check=True)
    print(f"Sweep '{args.sweep}' complete; parseable log at {log_path}")


if __name__ == "__main__":
    main()
