from .qam import qam_constellation, qam_demap_hard, qam_llr, qam_map
from .precoding import spectral_efficiency, zf_precoder
from .estimation import lmmse_equalize, ls_estimate
from .link import LinkConfig, simulate_ber

__all__ = [
    "qam_constellation",
    "qam_demap_hard",
    "qam_llr",
    "qam_map",
    "spectral_efficiency",
    "zf_precoder",
    "lmmse_equalize",
    "ls_estimate",
    "LinkConfig",
    "simulate_ber",
]
