from .nlspn_kernel import nlspn_stencil_propagate_pallas

__all__ = ["nlspn_stencil_propagate_pallas"]
