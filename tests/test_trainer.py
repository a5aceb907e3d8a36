"""Integration tests: tiny end-to-end training runs that must learn.

SURVEY §4: the integration test is a tiny train run reaching a loss threshold.
"""

import dataclasses
import io

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.parallel.mesh import make_mesh
from channelestimationtransformer_tpu.train.trainer import Trainer


def _tiny_setup(mesh=None, attn="full", batch_size=32):
    # Slow-fading channel (1 m/s): an easy prediction task so the learning
    # machinery is verifiable in a few hundred steps. The hard 30 km/h task
    # needs the full reference-scale run (seq 90 / d_model 128 / many epochs).
    cfg = InformerConfig(
        seq_len=24, label_len=6, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2,), d_layers=1, d_ff=32, dropout=0.0, attn=attn,
    )
    tc = TrainConfig(
        batch_size=batch_size, num_epochs=12, lr=1e-3, steps_per_epoch=30,
        log_every=10, seed=0,
    )
    model_cdl = CDLModel(num_bs_ant=8, num_ut_ant=2, ue_speed_ms=0.5)
    train_ds = make_window_dataset(
        jax.random.key(0), model=model_cdl, num_samples=128, num_slots=40,
        seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=30.0,
    )
    val_ds = make_window_dataset(
        jax.random.key(1), model=model_cdl, num_samples=32, num_slots=40,
        seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=30.0,
    )
    logs = []
    trainer = Trainer(
        model=build_informer(cfg), cfg=cfg, train_cfg=tc,
        train_data=train_ds, val_data=val_ds, mesh=mesh, log=logs.append,
    )
    return trainer, logs


def test_training_reduces_nmse():
    trainer, logs = _tiny_setup()
    first_val = trainer.run_validation(jax.random.key(42))["nmse"]
    history = trainer.fit()
    final = float(history[-1]["nmse"])
    initial = float(first_val)
    assert final < initial * 0.7, (initial, final)
    assert final < 0.8  # clearly better than predicting zeros (NMSE 1.0)


def test_log_format_is_reference_parseable():
    import re

    trainer, logs = _tiny_setup()
    trainer.fit(num_epochs=1)
    text = "\n".join(logs)
    # The exact regexes from reference Figures/parse.py.
    loss_pattern = re.compile(
        r"\| end of epoch\s+(\d+)\s+\|\s+.*\|\s+valid loss\s+(.+)\s+\|\s+Loss pred len\s+(.+)"
    )
    assert any(loss_pattern.match(l) for l in logs), text
    assert any(
        re.match(r"\| epoch\s+\d+ \|\s+\d+/\s*\d+ batches \| lr .* \| ms/batch .* \| loss .*", l)
        for l in logs
    ), text


def test_data_parallel_training_on_mesh():
    mesh = make_mesh(data=len(jax.devices()))
    trainer, _ = _tiny_setup(mesh=mesh)
    history = trainer.fit(num_epochs=1)
    assert np.isfinite(history[-1]["split"]).all()


def test_trainer_mesh_dispatches_to_dp_chunk(monkeypatch):
    """With a mesh, ``fit`` must run the per-shard DP pipeline, never the
    global-gather ``train_chunk`` (VERDICT r1 weak #2)."""
    from channelestimationtransformer_tpu.train import trainer as trainer_mod

    mesh = make_mesh(data=len(jax.devices()))
    trainer, _ = _tiny_setup(mesh=mesh)

    def _boom(*a, **k):
        raise AssertionError("global-gather train_chunk used despite mesh")

    monkeypatch.setattr(trainer_mod, "train_chunk", _boom)
    history = trainer.fit(num_epochs=1)
    assert np.isfinite(history[-1]["split"]).all()


def test_dp_chunk_hlo_has_no_dataset_allgather():
    """The compiled DP chunk must not all-gather the sharded dataset: no
    all-gather in the HLO may produce a tensor with the global dataset's
    (samples, slots) dims (VERDICT r1 weak #2 acceptance criterion)."""
    import re

    from channelestimationtransformer_tpu.train.trainer import train_chunk_dp

    mesh = make_mesh(data=len(jax.devices()))
    trainer, _ = _tiny_setup(mesh=mesh)
    kwargs = trainer._step_kwargs(trainer.train_data)
    batch = kwargs.pop("batch_size")
    lowered = train_chunk_dp.lower(
        trainer.state,
        trainer._train_h,
        jax.random.key(0),
        mesh=mesh,
        num_steps=2,
        per_device_batch=batch // mesh.shape["data"],
        **kwargs,
    )
    hlo = lowered.compile().as_text()
    n_samples, n_slots = trainer._train_h.shape[:2]
    gathers = re.findall(r".*all-gather.*", hlo)
    bad = [g for g in gathers if f"{n_samples},{n_slots}" in g.replace(" ", "")]
    assert not bad, bad


def test_epoch_train_scalar_is_mean_over_all_chunks():
    """Loss/train must be the mean over ALL steps of the epoch, not the last
    chunk's sum (VERDICT r1 weak #6)."""
    import pytest

    class _Writer:
        def __init__(self):
            self.rows = []

        def log_epoch(self, epoch, train, val, split):
            self.rows.append((epoch, train, val, split))

    trainer, _ = _tiny_setup()
    writer = _Writer()
    trainer.metrics_writer = writer

    sums = []
    orig = trainer._run_chunk

    def spy(rng, n):
        state, m = orig(rng, n)
        sums.append(float(m["loss_sum"]))
        return state, m

    trainer._run_chunk = spy
    trainer.fit(num_epochs=1)
    steps = trainer.train_cfg.steps_per_epoch
    assert len(sums) > 1  # multiple chunks: the bug class this guards against
    assert writer.rows[0][1] == pytest.approx(sum(sums) / steps, rel=1e-6)


def test_prob_attention_trains():
    trainer, _ = _tiny_setup(attn="prob")
    history = trainer.fit(num_epochs=1)
    assert np.isfinite(history[-1]["split"]).all()


def test_crash_resume_is_step_exact(tmp_path):
    """Failure-recovery story (SURVEY §5.3): a run killed after epoch k and
    resumed from its checkpoint replays the identical RNG streams (epoch-keyed)
    and reaches bit-identical parameters to an uninterrupted run."""
    from channelestimationtransformer_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    trainer_a, _ = _tiny_setup()
    hist_a = trainer_a.fit(num_epochs=4)

    # Interrupted run: 2 epochs, checkpoint, "crash", fresh process state,
    # resume epochs 2..3.
    trainer_b, _ = _tiny_setup()
    trainer_b.fit(num_epochs=2)
    path = save_checkpoint(trainer_b.state, str(tmp_path), "crash_", 2)

    trainer_c, _ = _tiny_setup()
    trainer_c.state, epoch, _ = load_checkpoint(path, trainer_c.state)
    assert epoch == 2
    hist_c = trainer_c.fit(num_epochs=4, start_epoch=2)

    for a, c in zip(
        jax.tree.leaves(trainer_a.state.params),
        jax.tree.leaves(trainer_c.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert np.isclose(hist_a[-1]["nmse"], hist_c[-1]["nmse"])


def test_rbg_prng_impl_trains():
    """TrainConfig.prng_impl='rbg' (the canonical fast config's hardware-RBG
    key stream) must thread through fit()'s window/AWGN/dropout streams and
    still train (bench.py/perf_study use the same knob)."""
    trainer, _ = _tiny_setup()
    trainer.train_cfg = dataclasses.replace(trainer.train_cfg, prng_impl="rbg",
                                            num_epochs=3)
    history = trainer.fit()
    assert len(history) == 3
    assert all(h["nmse"] == h["nmse"] for h in history)  # finite, no NaN
