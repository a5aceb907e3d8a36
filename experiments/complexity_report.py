"""Model complexity report: params + MACs for every model family.

Reference: ``ComparisonLSTMvsRNNvsGRUvsTransformer/complexityAnalysis.py:73-127``
(ptflops with custom input constructors; aten backend for transformers).
Here XLA's compiled-program cost analysis supplies FLOPs (MACs = FLOPs/2).
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

from channelestimationtransformer_tpu.core.config import (
    InformerConfig,
    RecurrentConfig,
    TransformerConfig,
)
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.recurrent import RecurrentPredictor
from channelestimationtransformer_tpu.models.transformer import Transformer
from channelestimationtransformer_tpu.utils.complexity import model_complexity


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--out", default="weights/complexity.json")
    args = p.parse_args()
    b = args.batch
    report = {}

    icfg = InformerConfig()
    model = build_informer(icfg)
    x_enc = jnp.zeros((b, icfg.seq_len, icfg.enc_in))
    x_dec = jnp.zeros((b, icfg.dec_len, icfg.dec_in))
    variables = model.init(jax.random.key(0), x_enc, x_dec)
    report["informer_stack"] = model_complexity(model, variables, x_enc, x_dec)

    tcfg = TransformerConfig()
    tmodel = Transformer(config=tcfg)
    tx_dec = jnp.zeros((b, tcfg.dec_len, tcfg.enc_in))
    tvars = tmodel.init(jax.random.key(0), x_enc[..., : tcfg.enc_in], tx_dec)
    report["transformer"] = model_complexity(
        tmodel, tvars, x_enc[..., : tcfg.enc_in], tx_dec
    )

    for cell in ("rnn", "gru", "lstm"):
        rcfg = RecurrentConfig(cell=cell)
        rmodel = RecurrentPredictor(config=rcfg)
        x = jnp.zeros((b, icfg.seq_len, rcfg.features))
        rvars = rmodel.init(jax.random.key(0), x)
        # The recurrent cell runs inside a time scan; cost_analysis counts
        # the body once, so scale by the T-1 teacher-forced steps.
        report[cell] = model_complexity(
            rmodel, rvars, x, sequential_steps=icfg.seq_len - 1
        )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    for k, v in report.items():
        macs = v["macs_per_sample"]
        print(f"{k}: params={v['params']:,} MACs/sample="
              f"{macs:,.0f}" if macs else f"{k}: params={v['params']:,} MACs=n/a")
    print(json.dumps({"sweep": "complexity", "models": list(report)}))


if __name__ == "__main__":
    main()
