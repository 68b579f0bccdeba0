from .pipelines import band_split_train, procedural_train
from .runner import (build_arch, build_problem, make_experiment_folder, train,
                     train_from_signal)

__all__ = [
    "train", "train_from_signal", "build_problem", "build_arch",
    "make_experiment_folder", "procedural_train", "band_split_train",
]
