from .deform import (
    bilinear_sample,
    deform_gather,
    modulated_deform_conv,
    kernel_grid_offsets,
)
from .nlspn import NLSPNParamsSpec, nlspn_propagate, precompute_taps

__all__ = [
    "bilinear_sample",
    "deform_gather",
    "modulated_deform_conv",
    "kernel_grid_offsets",
    "NLSPNParamsSpec",
    "nlspn_propagate",
    "precompute_taps",
]
