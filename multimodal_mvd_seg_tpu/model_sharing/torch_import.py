"""Import reference-trained torch checkpoints (nnU-Net / MVD .pth) into
this framework.

The reference trains `dynamic_network_architectures` PlainConvUNet
(consumed via /root/reference/nnUNet/nnunetv2/utilities/
get_network_from_plans.py:15-92) and saves checkpoints as
``{'network_weights': state_dict, ...}``
(nnUNetTrainer.save_checkpoint, nnUNetTrainer.py:1068-1091). This module
converts such a state dict into a parameter tree for
`models.unet.PlainConvUNetCF` with EXACT numerics, deriving the
architecture (features, kernel sizes, strides, classes) from the weight
shapes themselves.

Semantic differences handled:

- torch Conv3d pads symmetrically ((k-1)//2 per side); XLA "SAME" puts
  the extra pad of strided convs on the high side. The converted net must
  be built with ``conv_padding="TORCH"`` (see ConvCF) or strided stages
  are shifted one voxel.
- torch ConvTranspose3d with kernel==stride computes
  ``out[m*s + κ] += x[m] @ W[κ]``; ``lax.conv_transpose(..., "SAME")``
  indexes the kernel reversed (ops/s2d.py::solve_axis_transpose) — the
  converter flips the spatial axes of transpconv weights.
- reference transpconvs carry a bias (conv_bias=True) — build with
  ``transpconv_bias=True`` (auto-detected in `plain_conv_unet_kwargs`).
- nnU-Net state dicts name every ConvDropoutNormReLU parameter twice
  (``...conv.weight`` and the ``all_modules.{i}`` alias) and duplicate
  the whole encoder under ``decoder.encoder.*`` (UNetDecoder keeps an
  encoder reference); DDP adds a ``module.`` prefix and torch.compile
  ``_orig_mod.``. All are normalized away.

Verified end-to-end against a torch twin of the reference architecture in
tests/test_torch_import.py (forward parity to f32 roundoff).
"""

import re
from typing import Dict, Tuple

import numpy as np

__all__ = ["load_network_weights", "convert_plain_conv_unet",
           "plain_conv_unet_kwargs", "import_plain_conv_unet",
           "import_torch_model_folder"]


def load_network_weights(checkpoint_or_path):
    """torch.load a reference checkpoint (or accept an already-loaded
    dict / raw state dict) -> normalized {name: np.ndarray}."""
    obj = checkpoint_or_path
    if isinstance(obj, (str, bytes)) or hasattr(obj, "__fspath__"):
        import torch
        obj = torch.load(obj, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "network_weights" in obj:
        obj = obj["network_weights"]
    out = {}
    for k, v in obj.items():
        for pre in ("module.", "_orig_mod."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k.startswith("decoder.encoder."):
            continue  # UNetDecoder's back-reference duplicates the encoder
        if ".all_modules." in k:
            continue  # alias of the named conv/norm entries
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
    return out


_ENC = re.compile(r"^encoder\.stages\.(\d+)\.convs\.(\d+)\.(conv|norm)\."
                  r"(weight|bias)$")
_DEC = re.compile(r"^decoder\.stages\.(\d+)\.convs\.(\d+)\.(conv|norm)\."
                  r"(weight|bias)$")
_UP = re.compile(r"^decoder\.transpconvs\.(\d+)\.(weight|bias)$")
_SEG = re.compile(r"^decoder\.seg_layers\.(\d+)\.(weight|bias)$")


def _block(dst: Dict, scope: str, c: int, kind: str, which: str, arr):
    blk = dst.setdefault(scope, {}).setdefault(f"block{c}", {})
    if kind == "conv":
        blk.setdefault("conv", {})[
            "kernel" if which == "weight" else "bias"] = arr
    else:  # norm
        blk["scale" if which == "weight" else "bias"] = arr


def convert_plain_conv_unet(weights: Dict[str, np.ndarray]) -> Dict:
    """Normalized torch state dict -> PlainConvUNetCF parameter tree
    (pure numpy leaves, f32)."""
    params: Dict = {}
    unused = []
    for k, v in weights.items():
        v = np.asarray(v, np.float32)
        m = _ENC.match(k)
        if m:
            s, c, kind, which = m.groups()
            _block(params, f"encoder_stage{s}", int(c), kind, which, v)
            continue
        m = _DEC.match(k)
        if m:
            d, c, kind, which = m.groups()
            _block(params, f"dec{d}", int(c), kind, which, v)
            continue
        m = _UP.match(k)
        if m:
            d, which = m.groups()
            up = params.setdefault(f"up{d}", {})
            if which == "weight":
                # torch (Cin, Cout, *k) == ConvTransposeCF's IO*k layout,
                # but lax.conv_transpose indexes the kernel reversed
                up["kernel"] = np.flip(v, axis=tuple(range(2, v.ndim))
                                       ).copy()
            else:
                up["bias"] = v
            continue
        m = _SEG.match(k)
        if m:
            d, which = m.groups()
            params.setdefault(f"seg{d}", {})[
                "kernel" if which == "weight" else "bias"] = v
            continue
        unused.append(k)
    if unused:
        raise ValueError(f"unrecognized state-dict keys: {unused[:8]}"
                         f"{'…' if len(unused) > 8 else ''}")
    return params


def plain_conv_unet_kwargs(weights: Dict[str, np.ndarray],
                           first_stride: Tuple[int, ...] = None) -> Dict:
    """Derive the PlainConvUNetCF constructor kwargs from the weight
    shapes. ``first_stride`` (stage-0 stride) is not recoverable from
    weights; defaults to all-1 (every nnU-Net plan uses 1 there)."""
    enc_stages: Dict[int, Dict[int, tuple]] = {}
    dec_convs: Dict[int, int] = {}
    ups: Dict[int, tuple] = {}
    n_classes = None
    for k, v in weights.items():
        m = _ENC.match(k)
        if m and m.group(3) == "conv" and m.group(4) == "weight":
            enc_stages.setdefault(int(m.group(1)), {})[
                int(m.group(2))] = tuple(v.shape)
        m = _DEC.match(k)
        if m and m.group(3) == "conv" and m.group(4) == "weight":
            dec_convs[int(m.group(1))] = max(
                dec_convs.get(int(m.group(1)), 0), int(m.group(2)) + 1)
        m = _UP.match(k)
        if m and m.group(2) == "weight":
            ups[int(m.group(1))] = tuple(v.shape[2:])
        m = _SEG.match(k)
        if m and m.group(2) == "weight":
            n_classes = int(v.shape[0])
    n_stages = len(enc_stages)
    dim = len(next(iter(enc_stages[0].values()))) - 2
    features = [enc_stages[s][0][0] for s in range(n_stages)]
    kernels = [list(enc_stages[s][0][2:]) for s in range(n_stages)]
    # encoder stride into stage s+1 == transpconv kernel at decoder level
    # n_stages-2-s (kernel == stride in nnU-Net)
    strides = [list(first_stride or (1,) * dim)]
    for s in range(1, n_stages):
        strides.append(list(ups[n_stages - 1 - s]))
    return dict(
        features_per_stage=features,
        n_conv_per_stage_encoder=[len(enc_stages[s])
                                  for s in range(n_stages)],
        n_conv_per_stage_decoder=[dec_convs[d]
                                  for d in range(n_stages - 1)],
        kernel_sizes=kernels,
        strides=strides,
        num_classes=n_classes,
        conv_padding="TORCH",
        transpconv_bias=any("transpconvs.0.bias" in k for k in weights),
    )


def import_plain_conv_unet(checkpoint_or_path, *, deep_supervision=True,
                           dtype=None, seg_dtype=None):
    """One call: reference checkpoint -> (PlainConvUNetCF, {'params': ...}).

    The returned net is built with conv_padding="TORCH" /
    transpconv_bias as found, so its forward reproduces the torch
    network's voxel alignment exactly.
    """
    import jax.numpy as jnp

    from ..models.unet import PlainConvUNetCF
    weights = load_network_weights(checkpoint_or_path)
    kwargs = plain_conv_unet_kwargs(weights)
    kwargs["deep_supervision"] = deep_supervision
    if dtype is not None:
        kwargs["dtype"] = dtype
    if seg_dtype is not None:
        kwargs["seg_dtype"] = seg_dtype
    params = convert_plain_conv_unet(weights)
    params = {k: _tree_to_jnp(v, jnp) for k, v in params.items()}
    return PlainConvUNetCF(**kwargs), {"params": params}


def _tree_to_jnp(t, jnp):
    if isinstance(t, dict):
        return {k: _tree_to_jnp(v, jnp) for k, v in t.items()}
    return jnp.asarray(t)


def _check_against_plans(kwargs: Dict, plans: dict, configuration: str):
    """The weight-derived architecture must agree with what the plans
    describe — the predictor rebuilds the net FROM the plans, so a
    mismatch would mean params silently failing to line up."""
    from ..plans.plans_handler import PlansManager
    cm = PlansManager(plans).get_configuration(configuration)
    n = len(cm.conv_kernel_sizes)
    want = dict(
        features_per_stage=[min(cm.UNet_base_num_features * 2 ** i,
                                cm.unet_max_num_features)
                            for i in range(n)],
        n_conv_per_stage_encoder=list(cm.n_conv_per_stage_encoder),
        n_conv_per_stage_decoder=list(cm.n_conv_per_stage_decoder),
        kernel_sizes=[list(k) for k in cm.conv_kernel_sizes],
        strides=[list(s) for s in cm.pool_op_kernel_sizes],
    )
    bad = {k: (kwargs[k], want[k]) for k in want if kwargs[k] != want[k]}
    if bad:
        raise ValueError(
            f"checkpoint architecture does not match plans configuration "
            f"{configuration!r}: " + "; ".join(
                f"{k}: weights say {got}, plans say {exp}"
                for k, (got, exp) in bad.items()))


def import_torch_model_folder(src_dir: str, dst_dir: str,
                              checkpoint_names=("checkpoint_final.pth",
                                                "checkpoint_best.pth")):
    """Convert a whole reference trained-model folder
    (``.../DatasetXXX/nnUNetTrainer__nnUNetPlans__3d_fullres`` with
    plans.json, dataset.json and ``fold_*/checkpoint_*.pth`` as written by
    nnUNetTrainer.save_checkpoint, reference nnUNetTrainer.py:1068-1091)
    into this framework's results-folder format, directly runnable by
    ``mvdseg_predict`` / MVDSegPredictor.

    Per fold, each torch checkpoint becomes the same-stem ``.pkl`` with
    the keys the predictor restores (network_weights/init_args/
    trainer_name/inference_allowed_mirroring_axes) plus
    ``network_overrides`` — module-attribute overrides
    (conv_padding="TORCH", transpconv_bias) the predictor applies when it
    rebuilds the network from the plans, so the imported weights keep the
    reference's exact voxel alignment. Returns the converted fold->files
    mapping."""
    import json
    import os
    import pickle
    import shutil

    import torch

    plans = json.load(open(os.path.join(src_dir, "plans.json")))
    os.makedirs(dst_dir, exist_ok=True)
    for f in ("plans.json", "dataset.json"):
        shutil.copyfile(os.path.join(src_dir, f), os.path.join(dst_dir, f))
    # reference folder naming: <trainer>__<plans>__<configuration>
    name_parts = os.path.basename(os.path.normpath(src_dir)).split("__")
    folder_cfg = name_parts[-1] if len(name_parts) == 3 else None

    converted = {}
    for d in sorted(os.listdir(src_dir)):
        if not re.fullmatch(r"fold_(\d+|all)", d):
            continue
        for ckname in checkpoint_names:
            src_ck = os.path.join(src_dir, d, ckname)
            if not os.path.isfile(src_ck):
                continue
            ck = torch.load(src_ck, map_location="cpu", weights_only=False)
            init_args = dict(ck.get("init_args") or {})
            configuration = init_args.get("configuration") or folder_cfg
            if configuration is None:
                raise ValueError(
                    f"{src_ck}: checkpoint carries no init_args"
                    f"['configuration'] and the folder name "
                    f"{os.path.basename(src_dir)!r} is not "
                    f"<trainer>__<plans>__<configuration>")
            w = load_network_weights(ck)
            # stage-0 stride is not recoverable from weights — take it
            # from the plans (it is [1,1,1] in every shipped plan)
            from ..plans.plans_handler import PlansManager
            cm = PlansManager(plans).get_configuration(configuration)
            kwargs = plain_conv_unet_kwargs(
                w, first_stride=tuple(cm.pool_op_kernel_sizes[0]))
            _check_against_plans(kwargs, plans, configuration)
            params = convert_plain_conv_unet(w)
            out = {
                "network_weights": params,
                "trainer_name": ck.get("trainer_name", "nnUNetTrainer"),
                "init_args": {"configuration": configuration},
                "inference_allowed_mirroring_axes":
                    ck.get("inference_allowed_mirroring_axes"),
                "network_overrides": {
                    "conv_padding": "TORCH",
                    "transpconv_bias": kwargs["transpconv_bias"],
                },
                "imported_from": os.path.abspath(src_ck),
            }
            os.makedirs(os.path.join(dst_dir, d), exist_ok=True)
            dst_ck = os.path.join(
                dst_dir, d, os.path.splitext(ckname)[0] + ".pkl")
            with open(dst_ck, "wb") as fh:
                pickle.dump(out, fh)
            converted.setdefault(d, []).append(dst_ck)
    if not converted:
        raise FileNotFoundError(
            f"no fold_*/{{{','.join(checkpoint_names)}}} under {src_dir}")
    return converted
