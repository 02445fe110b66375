"""Network factory: plans → model.

Parity: reference nnunetv2/utilities/get_network_from_plans.py:15-92
(get_network_from_plans) and :94-242 (get_dual_network_from_plans, in
contrastive_net.py here). He-style init comes from flax's default
kaiming-variance conv init."""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..plans.plans_handler import ConfigurationManager, PlansManager
from ..plans.label_handling import determine_num_input_channels
from .unet import PlainConvUNet, PlainConvUNetCF, ResidualEncoderUNet


def _features_per_stage(configuration_manager: ConfigurationManager):
    num_stages = len(configuration_manager.conv_kernel_sizes)
    return [min(configuration_manager.UNet_base_num_features * 2 ** i,
                configuration_manager.unet_max_num_features)
            for i in range(num_stages)]


def _default_s2d_factors(patch_size):
    """Space-to-depth factors for the early stages (measured 1.85 -> 4.2
    train steps/s on the 3d_fullres benchmark shape, see ops/s2d.py).

    Prefer splitting the two leading axes and leaving the minor (lane) axis
    whole: splitting the minor axis produces odd-length phase-1 cell dims
    whose lane padding costs extra bandwidth (measured (2,2,1) > (1,2,2)).
    Ineligible stages are demoted at trace time by unet.s2d_stage_factors,
    so this is always safe."""
    dim = len(patch_size)
    if dim == 3 and patch_size[0] % 4 == 0 and patch_size[1] % 4 == 0:
        return (2, 2, 1)
    order = sorted(range(dim), key=lambda a: -patch_size[a])
    split = set(order[:min(2, dim)])
    return tuple(2 if a in split else 1 for a in range(dim))


def get_network_from_plans(plans_manager: PlansManager,
                           dataset_json: dict,
                           configuration_manager: ConfigurationManager,
                           num_input_channels: int,
                           deep_supervision: bool = True,
                           norm: str = "instance",
                           layout: str = "channels_first"):
    """Build the flax module described by the plans. Mirrors the mapping in
    reference get_network_from_plans.py:15-92 ('PlainConvUNet' /
    'ResidualEncoderUNet' by name).

    ``layout='channels_first'`` (TPU fast path, ~1.5× faster: see
    models/blocks.py) is used for the plain instance-norm U-Net; batch-norm
    and residual variants use the channels-last modules."""
    label_manager = plans_manager.get_label_manager(dataset_json)
    segmentation_network_class_name = configuration_manager.UNet_class_name
    common = dict(
        features_per_stage=_features_per_stage(configuration_manager),
        n_conv_per_stage_encoder=configuration_manager.n_conv_per_stage_encoder,
        n_conv_per_stage_decoder=configuration_manager.n_conv_per_stage_decoder,
        kernel_sizes=configuration_manager.conv_kernel_sizes,
        strides=configuration_manager.pool_op_kernel_sizes,
        num_classes=label_manager.num_segmentation_heads,
        deep_supervision=deep_supervision,
    )
    if segmentation_network_class_name == 'PlainConvUNet':
        if layout == "channels_first" and norm == "instance":
            return PlainConvUNetCF(
                s2d_stages=2,
                s2d_factors=_default_s2d_factors(
                    configuration_manager.patch_size),
                **common)
        return PlainConvUNet(norm=norm, **common)
    if segmentation_network_class_name == 'ResidualEncoderUNet':
        return ResidualEncoderUNet(norm=norm, **common)
    raise RuntimeError(
        f"Unknown UNet_class_name {segmentation_network_class_name!r}; "
        f"known: ['PlainConvUNet', 'ResidualEncoderUNet']")


def get_dual_network_from_plans(plans_manager: PlansManager,
                                dataset_json: dict,
                                configuration_manager: ConfigurationManager,
                                num_input_channels: int,
                                deep_supervision: bool = True):
    """Build the MVD dual-branch ContrastiveNet from plans. Mirrors the
    hard-coded construction at reference get_network_from_plans.py:94-242
    (feature_size=16, num_heads=4, InstanceNorm+LeakyReLU, do_ds from
    deep_supervision). Patch sizes must be divisible by the encoder's total
    downsampling (16, 32, 32) — the MVD plan's 64×128×256 patch is."""
    import os
    from .contrastive_net import ContrastiveNet
    label_manager = plans_manager.get_label_manager(dataset_json)
    patch = configuration_manager.patch_size
    # full-res blocks run space-to-depth when the patch allows (ops/s2d.py);
    # otherwise plain channels-first
    s2d = (2,) * len(patch) if all(p % 4 == 0 for p in patch) else None
    return ContrastiveNet(
        input_channels=num_input_channels,
        num_classes=label_manager.num_segmentation_heads,
        feature_size=16,
        num_heads=4,
        do_ds=deep_supervision,
        s2d_factors=s2d,
        # cell layout of the s2d stages (A/B-able without code changes)
        s2d_layout=os.environ.get("MVDSEG_MVD_S2D_LAYOUT", "NC"),
    )


def get_CSNet_from_plans(plans_manager: PlansManager, dataset_json: dict,
                         configuration_manager: ConfigurationManager,
                         num_input_channels: int,
                         deep_supervision: bool = True):
    """reference get_network_from_plans.py:244-253:
    CSNet3D(classes, channels)."""
    from .csnet_wingsnet import CSNet3D
    label_manager = plans_manager.get_label_manager(dataset_json)
    return CSNet3D(classes=label_manager.num_segmentation_heads,
                   channels=num_input_channels)


def get_wingsnet_from_plans(plans_manager: PlansManager, dataset_json: dict,
                            configuration_manager: ConfigurationManager,
                            num_input_channels: int,
                            deep_supervision: bool = True):
    """reference get_network_from_plans.py:254-262:
    WingsNet(in_channel, n_classes)."""
    from .csnet_wingsnet import WingsNet
    label_manager = plans_manager.get_label_manager(dataset_json)
    return WingsNet(in_channel=num_input_channels,
                    n_classes=label_manager.num_segmentation_heads)


def build_network_and_params(plans_manager: PlansManager, dataset_json: dict,
                             configuration_manager: ConfigurationManager,
                             rng: Optional[jax.Array] = None,
                             deep_supervision: bool = True,
                             num_input_channels: Optional[int] = None):
    """Instantiate module + init parameters with a dummy batch of the planned
    patch size (channels-last)."""
    if num_input_channels is None:
        num_input_channels = determine_num_input_channels(
            plans_manager, configuration_manager, dataset_json)
    network = get_network_from_plans(plans_manager, dataset_json,
                                     configuration_manager, num_input_channels,
                                     deep_supervision=deep_supervision)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    patch = tuple(configuration_manager.patch_size)
    dummy = jnp.zeros((1, *patch, num_input_channels), jnp.bfloat16)
    variables = network.init(rng, dummy, train=False)
    return network, variables
