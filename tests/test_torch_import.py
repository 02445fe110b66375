"""Reference-checkpoint import (model_sharing/torch_import.py): a torch
twin of the reference's dynamic_network_architectures PlainConvUNet
(ConvDropoutNormReLU naming, transpconv bias, decoder.encoder duplicate,
all_modules aliases — the state-dict shape nnU-Net checkpoints have) is
converted and must produce numerically identical outputs through
PlainConvUNetCF(conv_padding="TORCH"). This doubles as a cross-framework
numerical parity proof of the conv/norm/transpconv semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from multimodal_mvd_seg_tpu.model_sharing.torch_import import (  # noqa: E402
    convert_plain_conv_unet, import_plain_conv_unet, load_network_weights,
    plain_conv_unet_kwargs)

FEATURES = [4, 8, 16]
KERNEL = 3
STRIDES = [1, 2, 2]
N_CLASSES = 3
IN_CH = 2


def _t(v, dim=3):
    return tuple(v) if isinstance(v, (list, tuple)) else (v,) * dim


class ConvDropoutNormReLU(tnn.Module):
    def __init__(self, cin, cout, kernel, stride):
        super().__init__()
        kernel = _t(kernel)
        self.conv = tnn.Conv3d(cin, cout, kernel, _t(stride),
                               padding=tuple((k - 1) // 2 for k in kernel),
                               bias=True)
        self.norm = tnn.InstanceNorm3d(cout, eps=1e-5, affine=True)
        self.nonlin = tnn.LeakyReLU(0.01, inplace=False)
        # dna aliases the same modules under a Sequential — duplicated
        # state-dict names the importer must normalize away
        self.all_modules = tnn.Sequential(self.conv, self.norm, self.nonlin)

    def forward(self, x):
        return self.all_modules(x)


class StackedConvBlocks(tnn.Module):
    def __init__(self, n, cin, cout, kernel, first_stride):
        super().__init__()
        self.convs = tnn.Sequential(
            ConvDropoutNormReLU(cin, cout, kernel, first_stride),
            *[ConvDropoutNormReLU(cout, cout, kernel, 1)
              for _ in range(n - 1)])

    def forward(self, x):
        return self.convs(x)


class PlainConvEncoder(tnn.Module):
    def __init__(self, features, kernels, strides, n_convs, in_ch):
        super().__init__()
        stages, cin = [], in_ch
        for f, k, s, n in zip(features, kernels, strides, n_convs):
            stages.append(StackedConvBlocks(n, cin, f, k, s))
            cin = f
        self.stages = tnn.Sequential(*stages)

    def forward(self, x):
        skips = []
        for st in self.stages:
            x = st(x)
            skips.append(x)
        return skips


class UNetDecoder(tnn.Module):
    def __init__(self, encoder, features, kernels, strides, n_convs_dec,
                 n_classes):
        super().__init__()
        self.encoder = encoder  # dna keeps the back-reference (duplicates
        # the encoder under decoder.encoder.* in the state dict)
        n = len(features)
        ups, stages, segs = [], [], []
        for d in range(n - 1):
            skip = n - 2 - d
            f_in = features[skip + 1]
            f = features[skip]
            s = _t(strides[skip + 1])
            ups.append(tnn.ConvTranspose3d(f_in, f, s, s, bias=True))
            stages.append(StackedConvBlocks(n_convs_dec[d], 2 * f, f,
                                            kernels[skip], 1))
            segs.append(tnn.Conv3d(f, n_classes, 1, bias=True))
        self.transpconvs = tnn.ModuleList(ups)
        self.stages = tnn.ModuleList(stages)
        self.seg_layers = tnn.ModuleList(segs)

    def forward(self, skips):
        n = len(self.transpconvs) + 1
        x = skips[-1]
        outs = []
        for d in range(n - 1):
            skip = n - 2 - d
            x = self.transpconvs[d](x)
            x = torch.cat([x, skips[skip]], dim=1)
            x = self.stages[d](x)
            outs.append(self.seg_layers[d](x))
        return outs[::-1]  # nnU-Net: finest first


class PlainConvUNetTorch(tnn.Module):
    def __init__(self, features=FEATURES, kernels=None, strides=STRIDES,
                 n_convs_enc=None, n_convs_dec=None, in_ch=IN_CH,
                 n_classes=N_CLASSES):
        super().__init__()
        kernels = kernels or [KERNEL] * len(features)
        n_convs_enc = n_convs_enc or [2] * len(features)
        n_convs_dec = n_convs_dec or [2] * (len(features) - 1)
        self.encoder = PlainConvEncoder(features, kernels, strides,
                                        n_convs_enc, in_ch)
        self.decoder = UNetDecoder(self.encoder, features, kernels, strides,
                                   n_convs_dec, n_classes)

    def forward(self, x):
        return self.decoder(self.encoder(x))


@pytest.fixture(scope="module")
def torch_net_and_input():
    torch.manual_seed(0)
    net = PlainConvUNetTorch().eval()
    x = torch.randn(1, IN_CH, 8, 12, 16)
    return net, x


def test_kwargs_derived_from_weights(torch_net_and_input):
    net, _ = torch_net_and_input
    w = load_network_weights(net.state_dict())
    kw = plain_conv_unet_kwargs(w)
    assert kw["features_per_stage"] == FEATURES
    assert kw["n_conv_per_stage_encoder"] == [2, 2, 2]
    assert kw["n_conv_per_stage_decoder"] == [2, 2]
    assert kw["kernel_sizes"] == [[3, 3, 3]] * 3
    assert kw["strides"] == [[1, 1, 1], [2, 2, 2], [2, 2, 2]]
    assert kw["num_classes"] == N_CLASSES
    assert kw["transpconv_bias"] is True
    assert kw["conv_padding"] == "TORCH"


def test_forward_parity(torch_net_and_input):
    net, x = torch_net_and_input
    with torch.no_grad():
        ref = [t.numpy() for t in net(x)]
    # full nnU-Net-checkpoint shape: network_weights + DDP module. prefix
    ckpt = {"network_weights": {
        "module." + k: v for k, v in net.state_dict().items()}}
    jnet, variables = import_plain_conv_unet(
        ckpt, dtype=jnp.float32, seg_dtype=jnp.float32)
    xj = jnp.moveaxis(jnp.asarray(x.numpy()), 1, -1)  # channels-last entry
    outs = jax.jit(jnet.apply, static_argnames="train")(
        variables, xj, train=False)
    assert len(outs) == len(ref)
    for o, r in zip(outs, ref):
        o = np.moveaxis(np.asarray(o), -1, 1)
        assert o.shape == r.shape
        rel = np.abs(o - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 1e-4, rel


def test_model_folder_import_and_predict(synthetic_raw_dataset, tmp_path):
    """Full migration journey: a reference results folder (real generated
    plans + torch fold checkpoint) is converted by
    import_torch_model_folder and then driven through the standard
    SlidingWindowPredictor — network rebuilt FROM the plans with the
    checkpoint's network_overrides, forward parity vs torch, and an
    actual raw-file prediction."""
    import json
    import shutil

    from multimodal_mvd_seg_tpu.experiment_planning.api import (
        extract_fingerprints, plan_experiments)
    from multimodal_mvd_seg_tpu.inference.predictor import MVDSegPredictor
    from multimodal_mvd_seg_tpu.model_sharing.torch_import import (
        import_torch_model_folder)
    from multimodal_mvd_seg_tpu.plans.plans_handler import PlansManager

    ds = synthetic_raw_dataset
    extract_fingerprints([1], num_processes=1)
    plan_experiments([1])
    plans_file = f"{ds['preprocessed']}/{ds['dataset_name']}/nnUNetPlans.json"
    plans = json.load(open(plans_file))
    cm = PlansManager(plans).get_configuration("3d_fullres")
    n = len(cm.conv_kernel_sizes)
    features = [min(cm.UNet_base_num_features * 2 ** i,
                    cm.unet_max_num_features) for i in range(n)]

    torch.manual_seed(1)
    tnet = PlainConvUNetTorch(
        features=features, kernels=cm.conv_kernel_sizes,
        strides=cm.pool_op_kernel_sizes,
        n_convs_enc=cm.n_conv_per_stage_encoder,
        n_convs_dec=cm.n_conv_per_stage_decoder,
        in_ch=2, n_classes=3).eval()

    src = tmp_path / "ref" / "nnUNetTrainer__nnUNetPlans__3d_fullres"
    (src / "fold_0").mkdir(parents=True)
    shutil.copyfile(plans_file, src / "plans.json")
    shutil.copyfile(f"{ds['raw']}/{ds['dataset_name']}/dataset.json",
                    src / "dataset.json")
    torch.save({"network_weights": tnet.state_dict(),
                "init_args": {"configuration": "3d_fullres"},
                "trainer_name": "nnUNetTrainer",
                "inference_allowed_mirroring_axes": (0, 1, 2)},
               src / "fold_0" / "checkpoint_final.pth")

    dst = tmp_path / "imported"
    converted = import_torch_model_folder(str(src), str(dst))
    assert "fold_0" in converted

    pred = MVDSegPredictor(use_mirroring=False, verbose=False)
    pred.initialize_from_trained_model_folder(str(dst))
    assert pred.network.conv_padding == "TORCH"

    # forward parity through the plans-rebuilt network
    x = torch.randn(1, 2, *cm.patch_size)
    with torch.no_grad():
        ref = tnet(x)[0].numpy()  # finest head (ds=False on the jax side)
    xj = jnp.moveaxis(jnp.asarray(x.numpy()), 1, -1)
    params = pred.params_list[0]
    if "params" not in params:
        params = {"params": params}
    # parity is checked in f32 (the predict path itself stays bf16, whose
    # ~0.4%/op mantissa noise would swamp a conversion bug this small)
    net32 = pred.network.clone(dtype=jnp.float32, seg_dtype=jnp.float32)
    out = jax.jit(net32.apply, static_argnames="train")(
        params, xj, train=False)
    out = np.moveaxis(np.asarray(out), -1, 1)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-4, rel

    # real raw-file prediction through the imported folder
    img_dir = f"{ds['raw']}/{ds['dataset_name']}/imagesTr"
    files = [[f"{img_dir}/case_000_0000.nii.gz",
              f"{img_dir}/case_000_0001.nii.gz"]]
    out_dir = tmp_path / "preds"
    pred.predict_from_files(files, [str(out_dir / "case_000")])
    from multimodal_mvd_seg_tpu.imageio.nifti import read_nifti
    seg, _ = read_nifti(str(out_dir / "case_000.nii.gz"))
    assert seg.T.shape == ds["shape"]
    assert set(np.unique(seg)) <= {0, 1, 2}


def test_same_padding_differs(torch_net_and_input):
    """Sanity: without conv_padding='TORCH' the strided stages are shifted
    one voxel, so the import would silently corrupt features — pin that
    the difference is real."""
    net, x = torch_net_and_input
    with torch.no_grad():
        ref = [t.numpy() for t in net(x)]
    w = load_network_weights(net.state_dict())
    kw = plain_conv_unet_kwargs(w)
    kw.update(conv_padding="SAME", dtype=jnp.float32, seg_dtype=jnp.float32)
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    jnet = PlainConvUNetCF(**kw)
    params = convert_plain_conv_unet(w)
    xj = jnp.moveaxis(jnp.asarray(x.numpy()), 1, -1)
    outs = jax.jit(jnet.apply, static_argnames="train")(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, xj,
        train=False)
    o = np.moveaxis(np.asarray(outs[0]), -1, 1)
    rel = np.abs(o - ref[0]).max() / (np.abs(ref[0]).max() + 1e-9)
    assert rel > 1e-2, rel


def test_forward_parity_s2d(torch_net_and_input):
    """Imported checkpoints keep the fast space-to-depth execution:
    conv_padding="TORCH" is handled by the cell solver
    (ops/s2d.py::CellConvSpec pad_mode), so the s2d forward must match the
    torch reference exactly too. Input (8, 12, 16): stage 0 runs factored
    (1, 2, 2); stage 1 is demoted (6 % 4 != 0), so its strided TORCH entry
    conv consumes the factored rep — the exit-conv path."""
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    net, x = torch_net_and_input
    with torch.no_grad():
        ref = [t.numpy() for t in net(x)]
    w = load_network_weights(net.state_dict())
    kw = plain_conv_unet_kwargs(w)
    kw.update(dtype=jnp.float32, seg_dtype=jnp.float32,
              s2d_stages=2, s2d_factors=(1, 2, 2))
    jnet = PlainConvUNetCF(**kw)
    variables = {"params": convert_plain_conv_unet(w)}
    xj = jnp.moveaxis(jnp.asarray(x.numpy()), 1, -1)
    outs = jax.jit(jnet.apply, static_argnames="train")(
        variables, xj, train=False)
    for o, r in zip(outs, ref):
        o = np.moveaxis(np.asarray(o), -1, 1)
        assert o.shape == r.shape
        rel = np.abs(o - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 1e-4, rel


def test_load_pretrained_weights_from_torch_pth(torch_net_and_input,
                                                tmp_path):
    """run/run_training.py::load_pretrained_weights accepts a raw reference
    .pth (converted on the fly) and transfers every matching tensor EXCEPT
    the segmentation heads (reference load_pretrained_weights.py:21-23) —
    the fine-tune-a-reference-model migration path."""
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    from multimodal_mvd_seg_tpu.run.run_training import (
        load_pretrained_weights)

    tnet, _ = torch_net_and_input
    pth = tmp_path / "checkpoint_final.pth"
    torch.save({"network_weights": tnet.state_dict()}, pth)

    # a trainer-built net of the same architecture (framework-native SAME
    # padding — pretraining transfer does not require voxel alignment)
    net = PlainConvUNetCF(
        features_per_stage=FEATURES, n_conv_per_stage_encoder=[2] * 3,
        n_conv_per_stage_decoder=[2] * 2, kernel_sizes=[[3, 3, 3]] * 3,
        strides=[[s] * 3 for s in STRIDES], num_classes=N_CLASSES,
        deep_supervision=True, dtype=jnp.float32, seg_dtype=jnp.float32)
    x = jnp.zeros((1, 8, 12, 16, IN_CH), jnp.float32)
    params = jax.jit(lambda r: net.init(r, x, train=False))(
        jax.random.PRNGKey(7))["params"]

    class _State:
        def __init__(self, params):
            self.params = params
            self.batch_stats = None

        def replace(self, **kw):
            new = _State(kw.get("params", self.params))
            return new

    class _Stub:
        state = _State(params)

        def print_to_log_file(self, *a, **k):
            pass

    stub = _Stub()
    load_pretrained_weights(stub, str(pth))
    out = stub.state.params
    from multimodal_mvd_seg_tpu.model_sharing.torch_import import (
        convert_plain_conv_unet, load_network_weights)
    converted = convert_plain_conv_unet(load_network_weights(str(pth)))
    # encoder tensors transferred exactly
    np.testing.assert_array_equal(
        np.asarray(out["encoder_stage0"]["block0"]["conv"]["kernel"]),
        converted["encoder_stage0"]["block0"]["conv"]["kernel"])
    # seg heads NOT transferred (kept at their fresh init)
    assert np.array_equal(np.asarray(out["seg0"]["kernel"]),
                          np.asarray(params["seg0"]["kernel"]))
    assert not np.array_equal(np.asarray(out["seg0"]["kernel"]),
                              converted["seg0"]["kernel"])
