from .codebooks import (
    fibbinary_codebook,
    fibbinary_ints,
    fibonacci_sequence_codebook,
    lsq_fibbinary_codebook,
    nearest_codeword,
)
from .formats import BlockFloatingPoint, FixedPoint, FloatingPoint
from .functional import (
    block_quantize,
    fibonacci_quantize,
    fibonacci_quantize_partial,
    fixed_point_quantize,
    fixed_point_quantize_partial,
    float_quantize,
    no_adjacent_ones_quantize,
    quantizer,
    ste,
)
from .lsq import ConvLSQ, DenseLSQ, grad_scale, lsq_quantize, round_pass
from .optim import WeightQuantSettings, apply_weight_quant, quantize_grads

__all__ = [
    "fibbinary_codebook",
    "fibbinary_ints",
    "fibonacci_sequence_codebook",
    "lsq_fibbinary_codebook",
    "nearest_codeword",
    "BlockFloatingPoint",
    "FixedPoint",
    "FloatingPoint",
    "block_quantize",
    "fibonacci_quantize",
    "fibonacci_quantize_partial",
    "fixed_point_quantize",
    "fixed_point_quantize_partial",
    "float_quantize",
    "no_adjacent_ones_quantize",
    "quantizer",
    "ste",
    "ConvLSQ",
    "DenseLSQ",
    "grad_scale",
    "lsq_quantize",
    "round_pass",
    "WeightQuantSettings",
    "apply_weight_quant",
    "quantize_grads",
]
