"""Jitted training loop for the channel predictors.

Reference: ``FullPrecision/QuantizationAwareTraining.py:141-320`` (Adam + cosine
annealing, NMSE loss, per-epoch validation with the per-horizon split loss,
checkpoints, parseable text logs).

TPU-first differences:

- The *entire* step — batch window sampling, AWGN, packing, forward, backward,
  optimizer — is one jitted XLA program; the host only ticks the step counter.
  (The reference runs a torch DataLoader on host and ships batches H2D.)
- State is donated, so params/optimizer buffers update in place in HBM.
- Data parallelism: pass a ``Mesh``; the batch is sharded on the ``data`` axis
  and XLA inserts the gradient ``psum`` (the reference is single-device only).
- The log format replicates the reference's (parsed by ``Figures/parse.py``
  regexes — the format is an API, SURVEY §5.5/§7.4 quirk 11).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..core.config import InformerConfig, TrainConfig
from ..core.metrics import nmse, nmse_split
from ..data.windows import WindowDataset, make_batch
from ..parallel.mesh import batch_sharding, replicate_sharding


class TrainState(train_state.TrainState):
    """TrainState + BatchNorm running stats (the distil ConvLayer uses
    BatchNorm, reference ``encoder.py:12``)."""

    batch_stats: Any = None


def make_schedule(train_cfg: TrainConfig):
    """The LR schedule used by :func:`create_train_state` (reference: cosine
    annealing, ``FullPrecision/QuantizationAwareTraining.py:179``; optional
    linear warmup for from-scratch post-norm stability)."""
    total = max(train_cfg.num_epochs, 1) * train_cfg.steps_per_epoch
    if getattr(train_cfg, "schedule", "warmup_cosine") == "constant":
        # The reference's committed SNR-sweep runs hold lr constant at 1e-3
        # (FullPrecision/Figures/SNR.txt `| lr` fields) — replication mode.
        return optax.constant_schedule(train_cfg.lr)
    warmup = min(train_cfg.warmup_steps, max(total // 10, 1))
    if warmup >= total:
        # optax's warmup-cosine needs decay_steps > warmup_steps.
        total = warmup + 1
    if warmup > 0:
        # Linear warmup stabilizes the post-norm transformer at the
        # reference's 1e-3 peak (the reference sidesteps this by always
        # preloading a pretrained model).
        return optax.warmup_cosine_decay_schedule(
            init_value=train_cfg.lr * 1e-2,
            peak_value=train_cfg.lr,
            warmup_steps=warmup,
            decay_steps=total,
            end_value=train_cfg.lr_min,
        )
    return optax.cosine_decay_schedule(
        init_value=train_cfg.lr,
        decay_steps=total,
        alpha=train_cfg.lr_min / train_cfg.lr if train_cfg.lr else 0.0,
    )


def create_train_state(
    model,
    *,
    rng: jax.Array,
    cfg: InformerConfig,
    train_cfg: TrainConfig,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    x_enc = jnp.zeros((2, cfg.seq_len, cfg.enc_in))
    x_dec = jnp.zeros((2, cfg.dec_len, cfg.dec_in))
    variables = model.init(rng, x_enc, x_dec)
    if tx is None:
        schedule = make_schedule(train_cfg)
        if getattr(train_cfg, "weight_decay", 0.0):
            tx = optax.adamw(schedule, weight_decay=train_cfg.weight_decay)
        else:
            tx = optax.adam(schedule)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _apply(state: TrainState, params, batch_stats, x_enc, x_dec, *, train: bool, rngs=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    kwargs = dict(deterministic=not train)
    if train and batch_stats:
        out, updates = state.apply_fn(
            variables, x_enc, x_dec, rngs=rngs, mutable=["batch_stats"], **kwargs
        )
        return out, updates["batch_stats"]
    out = state.apply_fn(variables, x_enc, x_dec, rngs=rngs, **kwargs)
    return out, batch_stats


def _split_output(out):
    # output_attention configs return (pred, attns); training uses pred only.
    return out[0] if isinstance(out, tuple) else out


def _update(state: TrainState, x_enc, x_dec, target, k_drop, k_sample):
    """Forward/backward/adam on an already-sampled batch (shared by the
    global-gather and per-shard input paths)."""

    def loss_fn(params):
        out, new_stats = _apply(
            state, params, state.batch_stats, x_enc, x_dec,
            train=True, rngs={"dropout": k_drop, "sample": k_sample},
        )
        pred = _split_output(out)
        loss = nmse(pred, target)
        return loss, (new_stats, nmse_split(pred, target))

    (loss, (new_stats, split)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    return state, {"loss": loss, "loss_split": split}


def train_step_impl(
    state: TrainState,
    dataset_h: jnp.ndarray,
    step_rng: jax.Array,
    *,
    batch_size: int,
    label_len: int,
    seq_len: int = 0,
    pred_len: int = 0,
    snr_db: float = 0.0,
):
    """One fused step: sample windows -> AWGN -> forward/backward -> adam."""
    ds = WindowDataset(h=dataset_h, seq_len=seq_len, pred_len=pred_len, snr_db=snr_db)
    k_data, k_drop, k_sample = jax.random.split(step_rng, 3)
    x_enc, x_dec, target = make_batch(k_data, ds, batch_size, label_len)
    return _update(state, x_enc, x_dec, target, k_drop, k_sample)


train_step = partial(jax.jit, static_argnames=(
    "batch_size", "label_len", "seq_len", "pred_len"
), donate_argnums=(0,))(train_step_impl)


@partial(
    jax.jit,
    static_argnames=("num_steps", "batch_size", "label_len", "seq_len", "pred_len"),
    donate_argnums=(0,),
)
def train_chunk(
    state: TrainState,
    dataset_h: jnp.ndarray,
    chunk_rng: jax.Array,
    *,
    num_steps: int,
    batch_size: int,
    label_len: int,
    seq_len: int = 0,
    pred_len: int = 0,
    snr_db: float = 0.0,
):
    """``num_steps`` train steps as one ``lax.scan`` program.

    Removes all per-step host dispatch (each eager op is a tunnel round-trip
    on the axon runtime); metrics come back stacked, one fetch per chunk.
    """

    def body(carry, i):
        carry, metrics = train_step_impl(
            carry, dataset_h, jax.random.fold_in(chunk_rng, i),
            batch_size=batch_size, label_len=label_len,
            seq_len=seq_len, pred_len=pred_len, snr_db=snr_db,
        )
        return carry, (metrics["loss"], metrics["loss_split"])

    state, (losses, splits) = jax.lax.scan(
        body, state, jnp.arange(num_steps)
    )
    return state, {"loss_sum": jnp.sum(losses), "split_sum": jnp.sum(splits, axis=0)}


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_steps", "per_device_batch", "label_len", "seq_len", "pred_len",
    ),
    donate_argnums=(0,),
)
def train_chunk_dp(
    state: TrainState,
    dataset_h: jnp.ndarray,
    chunk_rng: jax.Array,
    *,
    mesh,
    num_steps: int,
    per_device_batch: int,
    label_len: int,
    seq_len: int = 0,
    pred_len: int = 0,
    snr_db: float = 0.0,
):
    """Data-parallel train chunk with a per-shard input pipeline.

    ``dataset_h`` is sharded on the ``data`` mesh axis and each device samples
    its ``per_device_batch`` windows from its LOCAL shard under ``shard_map``
    (per-device RNG fold). Sampling a data-sharded dataset with global random
    indices instead makes XLA all-gather the whole dataset every step — the
    scaling killer this path exists to avoid. The model/optimizer stay under
    the global jit: replicated params + batch-sharded activations, XLA inserts
    the gradient psum (global batch = per_device_batch * |data|)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm

        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

    def sample_local(h_local, key):
        ds = WindowDataset(
            h=h_local, seq_len=seq_len, pred_len=pred_len, snr_db=snr_db
        )
        k = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return make_batch(k, ds, per_device_batch, label_len)

    sample_sharded = shard_map(
        sample_local, mesh, in_specs=(P("data"), P()), out_specs=P("data")
    )

    def body(carry, i):
        k_data, k_drop, k_sample = jax.random.split(
            jax.random.fold_in(chunk_rng, i), 3
        )
        carry, metrics = _update(
            carry, *sample_sharded(dataset_h, k_data), k_drop, k_sample
        )
        return carry, (metrics["loss"], metrics["loss_split"])

    state, (losses, splits) = jax.lax.scan(body, state, jnp.arange(num_steps))
    return state, {"loss_sum": jnp.sum(losses), "split_sum": jnp.sum(splits, axis=0)}


def eval_step_impl(
    state: TrainState,
    dataset_h: jnp.ndarray,
    step_rng: jax.Array,
    *,
    batch_size: int,
    label_len: int,
    seq_len: int = 0,
    pred_len: int = 0,
    snr_db: float = 0.0,
):
    """Validation: per-horizon NMSE on one batch of fresh windows
    (reference ``run_validation``, ``FullPrecision/QuantizationAwareTraining.py:89-138``)."""
    ds = WindowDataset(h=dataset_h, seq_len=seq_len, pred_len=pred_len, snr_db=snr_db)
    k_data, k_sample = jax.random.split(step_rng)
    x_enc, x_dec, target = make_batch(k_data, ds, batch_size, label_len)
    out, _ = _apply(
        state, state.params, state.batch_stats, x_enc, x_dec,
        train=False, rngs={"sample": k_sample},
    )
    pred = _split_output(out)
    return {"split": nmse_split(pred, target), "nmse": nmse(pred, target)}


eval_step = partial(jax.jit, static_argnames=(
    "batch_size", "label_len", "seq_len", "pred_len"
))(eval_step_impl)


@partial(
    jax.jit,
    static_argnames=("num_batches", "batch_size", "label_len", "seq_len", "pred_len"),
)
def eval_chunk(
    state: TrainState,
    dataset_h: jnp.ndarray,
    chunk_rng: jax.Array,
    *,
    num_batches: int,
    batch_size: int,
    label_len: int,
    seq_len: int = 0,
    pred_len: int = 0,
    snr_db: float = 0.0,
):
    """All validation batches as one ``lax.scan`` program (one dispatch +
    one fetch per epoch instead of ``num_batches`` tunnel round-trips)."""

    def body(carry, i):
        m = eval_step_impl(
            state, dataset_h, jax.random.fold_in(chunk_rng, i),
            batch_size=batch_size, label_len=label_len,
            seq_len=seq_len, pred_len=pred_len, snr_db=snr_db,
        )
        return carry, (m["nmse"], m["split"])

    _, (nmses, splits) = jax.lax.scan(body, None, jnp.arange(num_batches))
    return {"nmse": jnp.mean(nmses), "split": jnp.mean(splits, axis=0)}


@dataclasses.dataclass
class Trainer:
    """Epoch-driven trainer with reference-format logging.

    ``mesh``: optional device mesh for data-parallel training; the dataset and
    drawn batches are sharded on the ``data`` axis, params replicated.
    """

    model: Any
    cfg: InformerConfig
    train_cfg: TrainConfig
    train_data: WindowDataset
    val_data: WindowDataset
    mesh: Any = None
    log: Callable[[str], None] = lambda msg: print(msg, flush=True)
    metrics_writer: Any = None  # utils.tensorboard.MetricsWriter or None
    checkpoint_tag: str = "tmodel_"

    def __post_init__(self):
        rng = jax.random.key(self.train_cfg.seed)  # init stays impl-invariant
        self.state = create_train_state(
            self.model, rng=rng, cfg=self.cfg, train_cfg=self.train_cfg
        )
        self._schedule = make_schedule(self.train_cfg)
        self._train_h = self.train_data.h
        self._val_h = self.val_data.h
        if self.mesh is not None:
            # Per-shard sampling (train_chunk_dp) draws each device's windows
            # from its contiguous local shard; a sorted on-disk dataset
            # (scenario/SNR/time ordered pickles) would permanently bias each
            # device's sub-batches, so shuffle sample order on host first.
            perm = jax.random.permutation(
                jax.random.key(self.train_cfg.seed ^ 0x5EED),
                self._train_h.shape[0],
            )
            self._train_h = self._train_h[perm]
            self.state = jax.device_put(self.state, replicate_sharding(self.mesh))
            self._train_h = jax.device_put(self._train_h, batch_sharding(self.mesh))
            self._val_h = jax.device_put(self._val_h, batch_sharding(self.mesh))
            n_data = self.mesh.shape["data"]
            if self.train_cfg.batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size {self.train_cfg.batch_size} not divisible by "
                    f"data-axis size {n_data}"
                )

    def _step_kwargs(self, data: WindowDataset):
        return dict(
            batch_size=self.train_cfg.batch_size,
            label_len=self.cfg.label_len,
            seq_len=data.seq_len,
            pred_len=data.pred_len,
            snr_db=data.snr_db,
        )

    def run_validation(self, epoch_rng: jax.Array, num_batches: int = 8) -> dict:
        """Per-horizon split loss (reference ``run_validation`` semantics, incl.
        the prediction-power normalization quirk) plus the target-normalized
        scalar NMSE for quirk-free comparisons."""
        return eval_chunk(
            self.state,
            self._val_h,
            epoch_rng,
            num_batches=num_batches,
            **self._step_kwargs(self.val_data),
        )

    def _run_chunk(self, rng: jax.Array, num_steps: int):
        """One compiled chunk of train steps, dispatched to the per-shard
        data-parallel pipeline when a mesh is present (global-index sampling
        on a batch-sharded dataset makes XLA all-gather the whole dataset
        every step — the scaling killer ``train_chunk_dp`` avoids)."""
        kwargs = self._step_kwargs(self.train_data)
        if self.mesh is not None:
            batch = kwargs.pop("batch_size")
            return train_chunk_dp(
                self.state,
                self._train_h,
                rng,
                mesh=self.mesh,
                num_steps=num_steps,
                per_device_batch=batch // self.mesh.shape["data"],
                **kwargs,
            )
        return train_chunk(
            self.state, self._train_h, rng, num_steps=num_steps, **kwargs
        )

    def fit(self, num_epochs: Optional[int] = None, start_epoch: int = 0):
        """Train; ``start_epoch`` resumes mid-schedule (per-epoch RNG streams
        are keyed by absolute epoch, so a resumed run replays the identical
        data/noise sequence — step-exact recovery, SURVEY §5.3)."""
        tc = self.train_cfg
        num_epochs = num_epochs if num_epochs is not None else tc.num_epochs
        steps = tc.steps_per_epoch
        root = jax.random.key(tc.seed + 1, impl=tc.prng_impl)
        history = []

        chunk = tc.log_every
        for epoch in range(start_epoch, num_epochs):
            epoch_rng = jax.random.fold_in(root, epoch)
            epoch_start = time.time()
            total_loss = 0.0

            batch_idx = 0
            while batch_idx < steps:
                n = min(chunk, steps - batch_idx)
                t0 = time.time()
                self.state, m = self._run_chunk(
                    jax.random.fold_in(epoch_rng, batch_idx), n
                )
                batch_idx += n
                stats = jax.device_get(
                    jnp.concatenate([jnp.reshape(m["loss_sum"], (1,)), m["split_sum"]])
                )
                total_loss += float(stats[0])
                ms_per_batch = (time.time() - t0) * 1000 / n
                cur = float(stats[0]) / n
                split = [float(v) / n for v in stats[1:]]
                dbg = "| Loss pred_len " + "".join(
                    f" {i}: {v:5.2f}" for i, v in enumerate(split)
                )
                # Live schedule value, like the reference's scheduler LR log
                # (parsed downstream by Figures/parse.py-equivalent regexes).
                lr = float(self._schedule(epoch * steps + batch_idx))
                if batch_idx < steps or steps <= chunk:
                    self.log(
                        f"| epoch {epoch:3d} | {batch_idx:5d}/{steps:5d} batches | "
                        f"lr {lr:e} | ms/batch {ms_per_batch:5.2f} | "
                        f"loss {cur:5.4f}  " + dbg
                    )

            val = self.run_validation(jax.random.fold_in(epoch_rng, 1 << 20))
            val_loss = jax.device_get(val["split"])
            elapsed = time.time() - epoch_start
            dbg = "| Loss pred len " + "".join(
                f" {i}: {v:5.2f}" for i, v in enumerate(val_loss)
            )
            self.log("-" * 89)
            self.log(
                f"| end of epoch {epoch:3d} | time: {elapsed:5.2f}s | "
                f"valid loss {float(val_loss.sum() / len(val_loss))} {dbg}"
            )
            self.log("-" * 89)
            val_nmse = float(jax.device_get(val["nmse"]))
            history.append({"split": val_loss, "nmse": val_nmse})
            if self.metrics_writer is not None:
                # Reference scalar set (Loss/train, Loss/val, Loss/val1..5);
                # Loss/train is the mean train loss over ALL steps this epoch.
                self.metrics_writer.log_epoch(
                    epoch, total_loss / steps, val_nmse, val_loss
                )
            if (
                tc.checkpoint_every_epochs
                and (epoch + 1) % tc.checkpoint_every_epochs == 0
            ):
                from .checkpoint import save_checkpoint

                save_checkpoint(
                    self.state, tc.checkpoint_dir, self.checkpoint_tag, epoch + 1
                )
        return history
