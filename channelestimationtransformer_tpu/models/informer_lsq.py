"""LSQ-quantized Informer factory.

Reference: ``models/InformerLSQ/`` and ``models/InformerLSQFibbinary/`` — full
vendored copies of the Informer tree with LinearLSQ/Conv1dLSQ swapped into the
attention projections and FFN convs (``attn.py:196-199``, ``encoder.py:38-39``,
``decoder.py:22-23``; token embedding and final projection stay FP32).

Here quantization is a config option threaded through the single model tree
(no vendored copies): ``build_informer_lsq(cfg, nbits, fibbinary)`` returns the
same Informer/InformerStack with every attention/FFN kernel wrapped in LSQ
fake quantization (``ops.quant.lsq``). Parameter names are unchanged, so FP32
checkpoints preload directly (the reference's ``strict=False`` pattern,
``QuantizationStudy/LSQ/TrainInformerLSQ.py:180-201``).
"""

from __future__ import annotations

import dataclasses

from ..core.config import InformerConfig
from .informer import InformerBase, build_informer


def build_informer_lsq(
    config: InformerConfig, *, nbits: int, fibbinary: bool = False
) -> InformerBase:
    cfg = dataclasses.replace(config, lsq_nbits=nbits, lsq_fibbinary=fibbinary)
    return build_informer(cfg)
