from .attention import mha_attention
from .quant import fused_fixed_point_quantize, fused_nearest_codeword

__all__ = [
    "mha_attention",
    "fused_fixed_point_quantize",
    "fused_nearest_codeword",
]
