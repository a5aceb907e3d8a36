from .packing import awgn, channel_norm, complex_to_real, real_to_complex
from .windows import WindowDataset, make_batch, sample_windows

__all__ = [
    "awgn",
    "channel_norm",
    "complex_to_real",
    "real_to_complex",
    "WindowDataset",
    "make_batch",
    "sample_windows",
]
