from .pallas_siren import fused_siren_apply

__all__ = ["fused_siren_apply"]
