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


class FinalNetv4Trainer(MVDSegTrainer):
    """Trains models.selfattn_net.FinalNetv4 (reference
    selfattnNet.py:1078-1160): dual per-modality encoders + two bottleneck
    self-attention decoders. The loss is the per-branch deep-supervised
    Dice+CE summed (the dual-output analogue of the base loss); at
    inference (do_ds=False forward) the network averages the two branch
    logits (reference :1153-1155). Also the rebuild target for imported
    reference FinalNetv4 checkpoints
    (model_sharing/torch_import.py::import_finalnet4)."""

    def build_network_architecture(self, deep_supervision: bool = True):
        from ...models.selfattn_net import FinalNetv4
        cm = self.configuration_manager
        assert self.num_input_channels == 2, \
            "FinalNetv4 is a dual-modality net (2 input channels)"
        n = len(cm.conv_kernel_sizes)
        features = [min(cm.UNet_base_num_features * 2 ** i,
                        cm.unet_max_num_features) for i in range(n)]
        return FinalNetv4(
            features_per_stage=features,
            n_conv_per_stage=cm.n_conv_per_stage_encoder,
            kernel_sizes=cm.conv_kernel_sizes,
            strides=cm.pool_op_kernel_sizes,
            num_classes=self.label_manager.num_segmentation_heads,
            do_ds=deep_supervision)

    def _loss_from_outputs(self, outputs, seg):
        if (isinstance(outputs, tuple) and len(outputs) == 2
                and isinstance(outputs[0], (list, tuple))):
            return (super()._loss_from_outputs(list(outputs[0]), seg)
                    + super()._loss_from_outputs(list(outputs[1]), seg))
        return super()._loss_from_outputs(outputs, seg)
