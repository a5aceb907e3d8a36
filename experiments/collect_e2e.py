"""Consolidate the end-to-end link-simulation branches into one artifact.

The reference's Sionna model switches perfect-CSI/LS estimation and
frequency/time-domain channels inside one Keras model
(``MimoSimulation/KerasFullSimulation.py:200-317``); our equivalents run as
separate ``experiments/end_to_end_sim.py`` invocations (uncoded, conv-coded,
LDPC-coded, LS CSI, time-domain). This collector merges their result JSONs —
and, for runs whose JSON landed in the since-wiped ``weights/`` directory,
re-parses the committed run logs — into ``experiments/artifacts/e2e_branches.json``.

Usage::

    python experiments/collect_e2e.py \
        [--extra name=path.json ...]   # merge fresh run outputs by branch name
"""

from __future__ import annotations

import argparse
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_LINE = re.compile(
    r"^(perfect|outdated|predicted): SE ([\d.]+) b/s/Hz, (coded )?BER "
    r"\[([^\]]+)\](?:, BLER \[([^\]]+)\])?"
)


def parse_log(path: str) -> dict | None:
    """Recover {ber, bler, se} per CSI source from an e2e run log."""
    out: dict = {"ber": {}, "se": {}, "recovered_from": os.path.relpath(path, ROOT)}
    found = False
    with open(path, errors="replace") as f:
        for raw in f:
            # conv logs contain tqdm \r frames; scan every fragment
            for line in raw.replace("\r", "\n").splitlines():
                m = _LINE.match(line.strip())
                if not m:
                    continue
                found = True
                name, se, coded, bers, blers = m.groups()
                out["ber"][name] = [float(x) for x in bers.split(",")]
                out["se"][name] = float(se)
                out["coded"] = bool(coded)
                if blers:
                    out.setdefault("bler", {})[name] = [
                        float(x) for x in blers.split(",")
                    ]
    return out if found else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--extra", nargs="*", default=[],
                   help="branch=path.json pairs from fresh runs")
    p.add_argument(
        "--out", default=os.path.join(HERE, "artifacts", "e2e_branches.json")
    )
    args = p.parse_args()

    branches: dict = {}

    # Headline uncoded artifact (committed round 2).
    headline = os.path.join(HERE, "artifacts", "e2e_results.json")
    if os.path.exists(headline):
        with open(headline) as f:
            branches["uncoded"] = json.load(f)

    for branch, log in [
        ("coded_conv", "logs/e2e_conv.log"),
        ("ls_csi", "logs/e2e_ls.log"),
        ("time_domain", "logs/e2e_time.log"),
        ("coded_ldpc", "logs/e2e_ldpc.log"),
    ]:
        path = os.path.join(ROOT, log)
        if branch in branches or not os.path.exists(path):
            continue
        rec = parse_log(path)
        if rec:
            branches[branch] = rec

    for pair in args.extra:
        branch, _, path = pair.partition("=")
        with open(path) as f:
            branches[branch] = json.load(f)

    with open(args.out, "w") as f:
        json.dump(branches, f, indent=1)
    print(json.dumps({"artifact": os.path.relpath(args.out, ROOT),
                      "branches": sorted(branches)}))


if __name__ == "__main__":
    main()
