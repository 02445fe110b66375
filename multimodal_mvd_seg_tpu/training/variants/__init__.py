"""Trainer variants.

Parity: the reference's 16 classes under
nnunetv2/training/nnUNetTrainer/variants/** (benchmarking, data
augmentation, loss, lr schedule, network architecture, optimizer, sampling,
training length). Each variant overrides exactly one aspect of the base
trainer through its hookpoints (_build_loss, _make_optimizer,
_augment_overrides, build_network_architecture, attributes).
"""

from .benchmarking import (nnUNetTrainerBenchmark_5epochs,
                           nnUNetTrainerBenchmark_5epochs_noDataLoading)
from .data_augmentation import (nnUNetTrainerDA5, nnUNetTrainerDA5ord0,
                                nnUNetTrainerDA5Segord0,
                                nnUNetTrainerDA5_10epochs,
                                nnUNetTrainerDAOrd0,
                                nnUNetTrainerNoDA, nnUNetTrainerNoMirroring)
from .loss_variants import (nnUNetTrainerCELoss, nnUNetTrainerDiceLoss,
                            nnUNetTrainerTopkLoss)
from .lr_schedule import nnUNetTrainerCosAnneal
from .network_architecture import (FinalNetv4Trainer, nnUNetTrainerBN,
                                   nnUNetTrainerNoDeepSupervision)
from .optimizer import nnUNetTrainerAdam, nnUNetTrainerAdan
from .sampling import nnUNetTrainer_probabilisticOversampling
from .training_length import (nnUNetTrainer_5epochs, nnUNetTrainer_10epochs,
                              nnUNetTrainer_20epochs, nnUNetTrainer_50epochs,
                              nnUNetTrainer_100epochs,
                              nnUNetTrainer_250epochs,
                              nnUNetTrainer_2000epochs,
                              nnUNetTrainer_4000epochs,
                              nnUNetTrainer_8000epochs,
                              nnUNetTrainer_Xepochs_NoMirroring)

__all__ = [
    "nnUNetTrainerBenchmark_5epochs",
    "nnUNetTrainerBenchmark_5epochs_noDataLoading",
    "nnUNetTrainerDA5", "nnUNetTrainerDA5ord0", "nnUNetTrainerDA5Segord0",
    "nnUNetTrainerDA5_10epochs", "nnUNetTrainerDAOrd0", "nnUNetTrainerNoDA",
    "nnUNetTrainerNoMirroring",
    "nnUNetTrainerCELoss", "nnUNetTrainerDiceLoss", "nnUNetTrainerTopkLoss",
    "nnUNetTrainerCosAnneal",
    "FinalNetv4Trainer", "nnUNetTrainerBN", "nnUNetTrainerNoDeepSupervision",
    "nnUNetTrainerAdam", "nnUNetTrainerAdan",
    "nnUNetTrainer_probabilisticOversampling",
    "nnUNetTrainer_5epochs", "nnUNetTrainer_10epochs",
    "nnUNetTrainer_20epochs", "nnUNetTrainer_50epochs",
    "nnUNetTrainer_100epochs", "nnUNetTrainer_250epochs",
    "nnUNetTrainer_2000epochs", "nnUNetTrainer_4000epochs",
    "nnUNetTrainer_8000epochs", "nnUNetTrainer_Xepochs_NoMirroring",
]
