from .cdl import CDL_B, CDLModel, generate_cdl_channel
from .beamforming import (
    beam_sweep_project,
    beam_sweep_project_sharded,
    dft_codebook,
    dft_codebook_ri,
)
from .dataset import (
    generate_beamformed_dataset,
    generate_beamformed_dataset_sharded,
)
from .interpolate import interpolate_slots

__all__ = [
    "CDL_B",
    "CDLModel",
    "generate_cdl_channel",
    "beam_sweep_project",
    "beam_sweep_project_sharded",
    "dft_codebook",
    "dft_codebook_ri",
    "generate_beamformed_dataset",
    "generate_beamformed_dataset_sharded",
    "interpolate_slots",
]
