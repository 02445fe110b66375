"""Network-architecture variants (reference
variants/network_architecture/): BatchNorm U-Net and no deep supervision."""

from ...models.factory import get_network_from_plans
from ..trainer import MVDSegTrainer


class nnUNetTrainerBN(MVDSegTrainer):
    def build_network_architecture(self, deep_supervision: bool = True):
        return get_network_from_plans(
            self.plans_manager, self.dataset_json, self.configuration_manager,
            self.num_input_channels, deep_supervision=deep_supervision,
            norm="batch")


class nnUNetTrainerNoDeepSupervision(MVDSegTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.enable_deep_supervision = False
