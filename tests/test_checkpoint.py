"""Checkpoint save/restore roundtrip + latest-glob + export utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from channelestimationtransformer_tpu.train.trainer import create_train_state
from channelestimationtransformer_tpu.utils.export import (
    export_weights_json,
    weight_dynamic_range,
)


def _state():
    cfg = InformerConfig(
        seq_len=16, label_len=4, pred_len=4, d_model=16, n_heads=2,
        e_layers=(1,), d_layers=1, d_ff=8,
    )
    model = build_informer(cfg)
    return create_train_state(
        model, rng=jax.random.key(0), cfg=cfg,
        train_cfg=TrainConfig(num_epochs=1, steps_per_epoch=1),
    )


def test_checkpoint_roundtrip(tmp_path):
    state = _state()
    path = save_checkpoint(state, str(tmp_path), "tmodel_", 7, extra={"snr": 21})
    assert os.path.exists(path)
    template = _state()
    restored, epoch, extra = load_checkpoint(path, template)
    assert epoch == 7 and extra == {"snr": 21}
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_glob(tmp_path):
    state = _state()
    for e in (1, 20, 3):
        save_checkpoint(state, str(tmp_path), "tmodel_", e)
    assert latest_checkpoint(str(tmp_path), "tmodel_").endswith("tmodel_20.msgpack")
    assert latest_checkpoint(str(tmp_path), "nope_") is None


def test_export_weights_and_dynamic_range(tmp_path):
    state = _state()
    path = str(tmp_path / "weights.json")
    export_weights_json(state.params, path)
    import json

    data = json.load(open(path))
    assert any(k.endswith("projection/kernel") for k in data)
    report = weight_dynamic_range(state.params)
    k = next(iter(report))
    assert {"min", "max", "mean_abs", "int_bits"} <= set(report[k])
