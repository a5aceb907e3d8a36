"""Measure the ProbSparse dense-select vs key-gather layout crossover.

``models/attention.py`` switches layout at ``DENSE_SCORES_MAX_LK``: at or
below it, the dense QK^T is computed on the MXU and sampled/selected rows are
extracted with scatter-free one-hot einsums; above it, keys are gathered per
query to keep memory O(L * sample_k * E). The 256 threshold was a guess
(VERDICT r4 item 7) — this driver times fwd+bwd of both layouts at the same
shapes over l in {128 .. 2048} (batch scaled down with l to hold the dense
scores' footprint roughly constant) and records where the gather layout
actually wins.

Writes experiments/artifacts/prob_crossover.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.models.attention import (
    prob_sparse_attention,
)

REPS = 10
# (l, batch): keep b*l ~ 24k so dense scores stay ~b*h*l^2*4B <= ~1.5 GB.
SHAPES = [(128, 192), (256, 96), (384, 64), (512, 48), (768, 32),
          (1024, 24), (1536, 16), (2048, 12)]
H, E = 8, 16


def timeit(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
        times.append((time.perf_counter() - t0) / REPS)
    return statistics.median(times) * 1000


def main():
    rng = np.random.default_rng(0)
    key = jax.random.key(7)
    rows = []
    for l, b in SHAPES:
        row = {"l": l, "batch": b}
        q, k, v = (jnp.asarray(rng.normal(size=(b, l, H, E)), jnp.float32)
                   for _ in range(3))
        for name, dense in (("dense_select", True), ("key_gather", False)):
            try:
                fn = jax.jit(jax.grad(lambda q, k, v, d=dense: jnp.sum(
                    prob_sparse_attention(
                        q, k, v, mask_flag=False, factor=5,
                        sample_rng=key, dense_layout=d,
                    )[0]
                )))
                row[f"ms_{name}"] = round(timeit(fn, q, k, v), 3)
            except Exception as exc:  # noqa: BLE001
                row[f"ms_{name}"] = None
                row[f"err_{name}"] = str(exc)[:150]
        if row.get("ms_dense_select") and row.get("ms_key_gather"):
            row["dense_wins"] = row["ms_dense_select"] < row["ms_key_gather"]
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"shapes_note": "fwd+bwd (jax.grad) per call, median of 3x10 reps, "
                          "heads=8 dim=16, batch scaled down with l",
           "rows": rows}
    path = os.path.join(os.path.dirname(__file__), "artifacts",
                        "prob_crossover.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
