from .pallas_kan import fused_kan_apply
from .pallas_siren import fused_siren_apply
from .pallas_siren_train import fused_siren_train_apply

__all__ = ["fused_kan_apply", "fused_siren_apply", "fused_siren_train_apply"]
