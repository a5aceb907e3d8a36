"""Typed configuration for models, data, and training.

The reference drives everything through per-experiment ``get_config()`` dicts
(reference ``FullPrecision/config.py:4-33``) whose keys drift between copies and
whose positional handoff into ``InformerStack(...)`` silently shifts arguments
(reference ``FullPrecision/QuantizationAwareTraining.py:61-86`` vs
``models/Informer/model.py:137-160``: ``distil`` lands in the ``output_attention``
slot, so distilling is always on and models always return ``(pred, attns)``).

Here configs are frozen dataclasses with keyword-only fields — the argument-shift
bug class is impossible — and the *effective* reference hyperparameters (distil on,
gelu activation) are the defaults, per SURVEY.md §7.4 quirk 1.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True, kw_only=True)
class InformerConfig:
    """Informer / InformerStack hyperparameters.

    Mirrors the *effective* config of the reference FullPrecision runs
    (reference ``FullPrecision/config.py:4-33`` + the §3.1 positional-shift quirk):
    distil on, gelu activation, attn selectable ("full" | "prob").
    """

    enc_in: int = 16
    dec_in: int = 16
    c_out: int = 16
    seq_len: int = 90
    label_len: int = 10
    pred_len: int = 5
    factor: int = 5
    d_model: int = 128
    n_heads: int = 8
    e_layers: Sequence[int] = (4, 3)  # one entry per encoder in the stack
    d_layers: int = 3
    d_ff: int = 64
    dropout: float = 0.05
    attn: str = "full"  # "full" | "prob" | "ring" (sequence-parallel exact)
    activation: str = "gelu"  # "gelu" | "relu"
    distil: bool = True
    mix: bool = True  # transpose heads<->seq on decoder self-attn output
    output_attention: bool = False
    # Pre-LayerNorm residual blocks (GPT-2/T5 style). The reference is
    # post-norm (models/Informer/encoder.py:50-55); pre-norm trains stably at
    # high LR without warmup and is the recommended from-scratch setting.
    pre_norm: bool = False
    dtype: str = "float32"  # computation dtype for activations
    # Fused Pallas attention kernels (ops/pallas/bd_attention.py: the
    # block-diagonal fwd+bwd kernel for the short-sequence regime, with the
    # long-sequence kernel as eval fallback). False = XLA einsum path.
    use_pallas: bool = False
    # Fuse the per-layer Q/K/V projections into one [d_model, 3*d_model]
    # matmul for self-attention (K/V pair for cross-attention). Exact same
    # math and init distribution; 3x fewer MXU dispatches per layer — a
    # latency-bound-regime optimization (DESIGN.md §8). Param layout differs
    # from the reference-faithful three-Dense tree (one "qkv" kernel), so
    # parity runs keep it off.
    fuse_qkv: bool = False
    # LSQ weight quantization of attention/FFN projections (reference
    # models/InformerLSQ + models/InformerLSQFibbinary): None = FP32.
    lsq_nbits: int | None = None
    lsq_fibbinary: bool = False

    def __post_init__(self):
        if self.attn not in ("full", "prob", "ring"):
            raise ValueError(
                f"attn must be 'full', 'prob' or 'ring', got {self.attn!r}")
        if self.attn == "ring" and self.distil:
            raise ValueError(
                "attn='ring' shards the encoder sequence axis; the distilling "
                "conv pyramid produces shard-indivisible lengths — use "
                "distil=False for sequence-parallel configs")
        if self.activation not in ("gelu", "relu"):
            raise ValueError(f"activation must be 'gelu' or 'relu', got {self.activation!r}")

    @property
    def dec_len(self) -> int:
        return self.label_len + self.pred_len


@dataclasses.dataclass(frozen=True, kw_only=True)
class TransformerConfig:
    """Vanilla encoder-decoder transformer baseline
    (reference ``models/Transformer/model.py:90-174`` ``build_transformer``)."""

    enc_in: int = 16
    c_out: int = 16
    seq_len: int = 90
    label_len: int = 10
    pred_len: int = 5
    d_model: int = 128
    n_heads: int = 8
    num_encoder_layers: int = 4
    num_decoder_layers: int = 3
    d_ff: int = 64
    dropout: float = 0.05
    dtype: str = "float32"

    @property
    def dec_len(self) -> int:
        return self.label_len + self.pred_len


@dataclasses.dataclass(frozen=True, kw_only=True)
class RecurrentConfig:
    """RNN/GRU/LSTM baselines (reference ``models/{RNN,GRU,LSTM}/model.py``):
    Linear encoder -> recurrent core -> Linear decoder, teacher-forced train,
    closed-loop eval rollout."""

    features: int = 16
    input_size: int = 128
    hidden_size: int = 256
    num_layers: int = 2
    cell: str = "lstm"  # "rnn" | "gru" | "lstm"
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True, kw_only=True)
class DataConfig:
    """Dataset geometry + noise model (reference ``Utils/dataset.py`` SeqData)."""

    seq_len: int = 90
    pred_len: int = 5
    snr_db: float = 21.0
    # Effective channel geometry after beamforming: Nr rx antennas x Nt beams,
    # flattened complex -> enc_in = nr * nt * 2 real features.
    nr: int = 2
    nt: int = 4
    slots: int = 100  # SRS slots per stored sample ("Seq_Len_100" datasets)

    @property
    def features(self) -> int:
        return self.nr * self.nt * 2


@dataclasses.dataclass(frozen=True, kw_only=True)
class TrainConfig:
    """Optimizer / loop settings (reference ``FullPrecision/config.py``:
    batch 256, Adam lr 1e-4, cosine annealing, 1000-epoch ceiling)."""

    batch_size: int = 256
    num_epochs: int = 100
    lr: float = 1e-4
    lr_min: float = 0.0
    weight_decay: float = 0.0  # >0 switches Adam -> AdamW (decoupled decay)
    seed: int = 0
    steps_per_epoch: int = 226  # reference: 226 batches/epoch at batch 256
    warmup_steps: int = 1000  # linear LR warmup (0 = reference plain cosine)
    # "warmup_cosine" (default) or "constant". The reference's committed
    # SNR-sweep logs train with a CONSTANT lr 1e-3 for all 50 epochs
    # (FullPrecision/Figures/SNR.txt: every `| lr` field is 1.000000e-03),
    # despite config.py nominally specifying cosine annealing — use
    # "constant" when replicating those runs.
    schedule: str = "warmup_cosine"
    checkpoint_every_epochs: int = 100
    log_every: int = 22  # ~len/10 per the reference logging cadence
    # PRNG key implementation for the training streams (dataset windows, AWGN,
    # dropout). "rbg" uses the TPU hardware random-bit generator instead of
    # the threefry2x32 ALU ladder — the bench's canonical fast config; the
    # quality A/B vs threefry is experiments/interleaved_ab.py (r4 canonical).
    prng_impl: str = "threefry2x32"
    checkpoint_dir: str = "weights"
    experiment_name: str = "runs/tmodel"


def full_precision_config() -> tuple[InformerConfig, DataConfig, TrainConfig]:
    """The FullPrecision experiment's effective configuration
    (reference ``FullPrecision/config.py:4-33`` + SURVEY §7.4 quirk 1)."""
    return InformerConfig(), DataConfig(), TrainConfig()
