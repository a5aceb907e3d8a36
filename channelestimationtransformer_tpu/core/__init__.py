from .config import (
    DataConfig,
    InformerConfig,
    RecurrentConfig,
    TrainConfig,
    TransformerConfig,
    full_precision_config,
)
from .metrics import nmse, nmse_db, nmse_split

__all__ = [
    "DataConfig",
    "InformerConfig",
    "RecurrentConfig",
    "TrainConfig",
    "TransformerConfig",
    "full_precision_config",
    "nmse",
    "nmse_db",
    "nmse_split",
]
