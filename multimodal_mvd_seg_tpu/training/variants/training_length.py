"""Training-length variants (reference variants/training_length/
nnUNetTrainer_Xepochs.py + _NoMirroring)."""

from ..trainer import MVDSegTrainer
from .data_augmentation import nnUNetTrainerNoMirroring


def _epochs(n):
    class _T(MVDSegTrainer):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.num_epochs = n
    _T.__name__ = _T.__qualname__ = f"nnUNetTrainer_{n}epochs"
    return _T


nnUNetTrainer_5epochs = _epochs(5)
nnUNetTrainer_10epochs = _epochs(10)
nnUNetTrainer_20epochs = _epochs(20)
nnUNetTrainer_50epochs = _epochs(50)
nnUNetTrainer_100epochs = _epochs(100)
nnUNetTrainer_250epochs = _epochs(250)
nnUNetTrainer_2000epochs = _epochs(2000)
nnUNetTrainer_4000epochs = _epochs(4000)
nnUNetTrainer_8000epochs = _epochs(8000)


class nnUNetTrainer_Xepochs_NoMirroring(nnUNetTrainerNoMirroring):
    """250-epoch no-mirroring variant (reference
    nnUNetTrainer_Xepochs_NoMirroring.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_epochs = 250
