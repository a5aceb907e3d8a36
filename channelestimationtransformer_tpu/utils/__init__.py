from .complexity import count_params, estimate_macs, model_complexity
from .export import export_weights_json, weight_dynamic_range
from .parse_logs import final_valid_losses, parse_log_file, parse_log_text
from .profiling import device_memory_stats, throughput, time_fn, trace
from .tensorboard import MetricsWriter

__all__ = [
    "count_params",
    "estimate_macs",
    "model_complexity",
    "export_weights_json",
    "weight_dynamic_range",
    "final_valid_losses",
    "parse_log_file",
    "parse_log_text",
    "device_memory_stats",
    "throughput",
    "time_fn",
    "trace",
    "MetricsWriter",
]
