from .depth_metrics import RDFGANMetric, compute_depth_metrics, METRIC_NAMES

__all__ = ["RDFGANMetric", "compute_depth_metrics", "METRIC_NAMES"]
