from .export import export_weights_json, weight_dynamic_range

__all__ = ["export_weights_json", "weight_dynamic_range"]
