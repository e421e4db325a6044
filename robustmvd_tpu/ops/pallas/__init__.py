from .softargmin import fused_soft_argmin, fused_soft_argmin_reference

__all__ = ["fused_soft_argmin", "fused_soft_argmin_reference"]
