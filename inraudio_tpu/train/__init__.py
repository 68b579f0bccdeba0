from .checkpoint import checkpoint_extra, load_checkpoint, save_checkpoint
from .loop import (FitResult, TrainConfig, TrainState, fit, init_train_state,
                   make_train_step)
from .losses import (mae, mix_loss, mse, multi_resolution_stft_loss, snr_loss,
                     stft_loss, weighted_mse)
from .multi_inr import (MultiINRConfig, MultiINRResult, chunk_signal,
                        multi_inr_decode, multi_inr_decode_range,
                        multi_inr_fit, multi_inr_fit_many, stitch_chunks)
from .optim import (AdamConfig, AdamState, PlateauConfig, PlateauState,
                    adam_init, adam_update, plateau_init, plateau_update)

__all__ = [
    "fit", "FitResult", "TrainConfig", "TrainState", "init_train_state",
    "make_train_step",
    "mse", "mae", "snr_loss", "stft_loss", "multi_resolution_stft_loss",
    "mix_loss", "weighted_mse",
    "AdamConfig", "AdamState", "PlateauConfig", "PlateauState",
    "adam_init", "adam_update", "plateau_init", "plateau_update",
    "save_checkpoint", "load_checkpoint", "checkpoint_extra",
    "MultiINRConfig", "MultiINRResult", "chunk_signal", "multi_inr_fit",
    "multi_inr_fit_many", "multi_inr_decode",
    "multi_inr_decode_range", "stitch_chunks",
]
