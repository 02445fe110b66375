"""Generate golden preprocessing fixtures by EXECUTING the reference
implementation (/root/reference, JaronTu/Multimodal_MVD_Seg) on synthetic
cases — VERDICT.md round-1 item 4 ("golden-fixture preprocessing parity").

This script is run ONCE in an environment that has the reference checkout;
its output (preprocessing_golden.npz, committed) pins the reference's
crop/normalize/class-locations behavior bit-exactly and its resampling
behavior to float tolerance. tests/test_preprocessing_parity.py then
validates the in-repo preprocessing against the fixture with NO runtime
dependency on the reference.

How the reference code is executed here (this environment lacks some of its
pip deps); every shim below is a faithful stand-in for a public library
function, documented with its source of truth:

- ``skimage.transform.resize``: for the exact argument combination nnU-Net
  uses (mode='edge', anti_aliasing=False, clip=True, float input),
  skimage >= 0.19 reduces to ``scipy.ndimage.zoom(image, out/in,
  order=order, mode='nearest', grid_mode=True)`` followed by clipping to
  the input range (skimage/transform/_warps.py). We install that reduction
  as the stub — scipy is the same backend skimage calls.
- ``batchgenerators.augmentations.utils.resize_segmentation``: recreated
  from the public batchgenerators==0.25 semantics (order-0 directly, else
  per-unique-label one-hot resize with >= 0.5 threshold).
- ``acvl_utils.cropping_and_padding.bounding_boxes``: the three bbox
  helpers (public acvl-utils), trivially specified: half-open [min, max)
  bounds per axis and their slices.
- ``nnunetv2`` package internals that default_preprocessor.py imports but
  does not use in run_case_npy (paths, dataset-name conversion, plans
  handler *types*) are stubbed with inert placeholders; plans/configuration
  managers are duck-typed dataclasses carrying exactly the fields
  run_case_npy reads.

Reference files executed verbatim:
  nnunetv2/preprocessing/cropping/cropping.py
  nnunetv2/preprocessing/resampling/default_resampling.py
  nnunetv2/preprocessing/normalization/default_normalization_schemes.py
  nnunetv2/preprocessing/preprocessors/default_preprocessor.py

Usage:  python tests/fixtures/generate_preprocessing_golden.py
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference/nnUNet/nnunetv2"
OUT = os.path.join(os.path.dirname(__file__), "preprocessing_golden.npz")


# --------------------------------------------------------------------- shims
def _install_stubs():
    from scipy import ndimage as ndi

    # skimage.transform.resize — see module docstring
    def resize(image, output_shape, order=None, mode="reflect", cval=0,
               clip=True, preserve_range=False, anti_aliasing=None,
               anti_aliasing_sigma=None):
        assert anti_aliasing in (False, None), "shim covers nnU-Net's calls"
        assert mode == "edge", "shim covers nnU-Net's calls"
        image = np.asarray(image, dtype=float)
        output_shape = tuple(int(i) for i in output_shape)
        if image.shape == output_shape:
            return image.copy()
        if order is None:
            order = 1
        factors = [o / i for o, i in zip(output_shape, image.shape)]
        out = ndi.zoom(image, factors, order=order, mode="nearest",
                       grid_mode=True)
        # ndi.zoom rounds the output shape; enforce exactness
        assert out.shape == output_shape, (out.shape, output_shape)
        if clip and order > 0:
            out = np.clip(out, image.min(), image.max())
        return out

    sk = types.ModuleType("skimage")
    sk_t = types.ModuleType("skimage.transform")
    sk_t.resize = resize
    sk.transform = sk_t
    sys.modules["skimage"] = sk
    sys.modules["skimage.transform"] = sk_t

    # batchgenerators.augmentations.utils.resize_segmentation (bg==0.25)
    def resize_segmentation(segmentation, new_shape, order=3):
        tpe = segmentation.dtype
        unique_labels = np.unique(segmentation)
        assert len(segmentation.shape) == len(new_shape)
        if order == 0:
            return resize(segmentation.astype(float), new_shape, order,
                          mode="edge", clip=True,
                          anti_aliasing=False).astype(tpe)
        reshaped = np.zeros(new_shape, dtype=segmentation.dtype)
        for c in unique_labels:
            mask = segmentation == c
            reshaped_multihot = resize(mask.astype(float), new_shape, order,
                                       mode="edge", clip=True,
                                       anti_aliasing=False)
            reshaped[reshaped_multihot >= 0.5] = c
        return reshaped

    bg = types.ModuleType("batchgenerators")
    bg_aug = types.ModuleType("batchgenerators.augmentations")
    bg_utils = types.ModuleType("batchgenerators.augmentations.utils")
    bg_utils.resize_segmentation = resize_segmentation
    bg_ffo = types.ModuleType(
        "batchgenerators.utilities.file_and_folder_operations")
    import json as _json

    def load_json(f):
        with open(f) as fh:
            return _json.load(fh)

    # the real module star-exports typing names; preprocessor relies on it
    from typing import Dict, List, Optional, Tuple, Union
    bg_ffo.List, bg_ffo.Tuple, bg_ffo.Union = List, Tuple, Union
    bg_ffo.Dict, bg_ffo.Optional = Dict, Optional
    bg_ffo.join = os.path.join
    bg_ffo.isfile = os.path.isfile
    bg_ffo.isdir = os.path.isdir
    bg_ffo.load_json = load_json
    bg_ffo.maybe_mkdir_p = lambda p: os.makedirs(p, exist_ok=True)
    bg_ffo.write_pickle = lambda *a, **k: None
    bg_ffo.subfiles = lambda *a, **k: []
    bg_util_pkg = types.ModuleType("batchgenerators.utilities")
    sys.modules["batchgenerators"] = bg
    sys.modules["batchgenerators.augmentations"] = bg_aug
    sys.modules["batchgenerators.augmentations.utils"] = bg_utils
    sys.modules["batchgenerators.utilities"] = bg_util_pkg
    sys.modules["batchgenerators.utilities.file_and_folder_operations"] = \
        bg_ffo

    # acvl_utils bbox helpers (public acvl-utils contract: half-open bounds)
    def get_bbox_from_mask(mask):
        axes = list(range(mask.ndim))
        bbox = []
        for ax in axes:
            other = tuple(a for a in axes if a != ax)
            nz = np.flatnonzero(mask.any(axis=other))
            bbox.append([int(nz[0]), int(nz[-1]) + 1] if nz.size
                        else [0, mask.shape[ax]])
        return bbox

    def bounding_box_to_slice(bbox):
        return tuple(slice(lo, hi) for lo, hi in bbox)

    def crop_to_bbox(array, bbox):
        return array[bounding_box_to_slice(bbox)]

    acvl = types.ModuleType("acvl_utils")
    acvl_cp = types.ModuleType("acvl_utils.cropping_and_padding")
    acvl_bb = types.ModuleType(
        "acvl_utils.cropping_and_padding.bounding_boxes")
    acvl_bb.get_bbox_from_mask = get_bbox_from_mask
    acvl_bb.bounding_box_to_slice = bounding_box_to_slice
    acvl_bb.crop_to_bbox = crop_to_bbox
    sys.modules["acvl_utils"] = acvl
    sys.modules["acvl_utils.cropping_and_padding"] = acvl_cp
    sys.modules["acvl_utils.cropping_and_padding.bounding_boxes"] = acvl_bb

    # inert nnunetv2 internals (not exercised by run_case_npy)
    nn = types.ModuleType("nnunetv2")
    nn.__path__ = [REF]
    sys.modules["nnunetv2"] = nn
    cfg = types.ModuleType("nnunetv2.configuration")
    cfg.ANISO_THRESHOLD = 3
    sys.modules["nnunetv2.configuration"] = cfg
    paths = types.ModuleType("nnunetv2.paths")
    paths.nnUNet_preprocessed = None
    paths.nnUNet_raw = None
    sys.modules["nnunetv2.paths"] = paths
    for name, symbols in [
            ("nnunetv2.utilities.dataset_name_id_conversion",
             {"maybe_convert_to_dataset_name": lambda x: x}),
            ("nnunetv2.utilities.plans_handling.plans_handler",
             {"PlansManager": object, "ConfigurationManager": object}),
            ("nnunetv2.utilities.utils",
             {"get_identifiers_from_splitted_dataset_folder":
                  lambda *a, **k: [],
              "create_lists_from_splitted_dataset_folder":
                  lambda *a, **k: [],
              "get_filenames_of_train_images_and_targets":
                  lambda *a, **k: {}})]:
        m = types.ModuleType(name)
        for k, v in symbols.items():
            setattr(m, k, v)
        sys.modules[name] = m
    for pkg in ("nnunetv2.utilities", "nnunetv2.utilities.plans_handling",
                "nnunetv2.preprocessing", "nnunetv2.preprocessing.cropping",
                "nnunetv2.preprocessing.resampling",
                "nnunetv2.preprocessing.normalization",
                "nnunetv2.preprocessing.preprocessors"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_reference():
    _install_stubs()
    cropping = _load("nnunetv2.preprocessing.cropping.cropping",
                     "preprocessing/cropping/cropping.py")
    resampling = _load(
        "nnunetv2.preprocessing.resampling.default_resampling",
        "preprocessing/resampling/default_resampling.py")
    norm = _load(
        "nnunetv2.preprocessing.normalization.default_normalization_schemes",
        "preprocessing/normalization/default_normalization_schemes.py")

    # recursive_find_python_class → look up the loaded normalization module
    fcbn = types.ModuleType("nnunetv2.utilities.find_class_by_name")
    fcbn.recursive_find_python_class = \
        lambda folder, class_name, current_module: getattr(norm, class_name)
    sys.modules["nnunetv2.utilities.find_class_by_name"] = fcbn

    pre = _load("nnunetv2.preprocessing.preprocessors.default_preprocessor",
                "preprocessing/preprocessors/default_preprocessor.py")
    return cropping, resampling, norm, pre


# ---------------------------------------------------------- synthetic inputs
def make_case(seed=0, shape=(24, 28, 30)):
    """2-channel case with a zero border (so cropping bites), a CT-like
    channel 0 and a z-scored channel 1, labels {0,1,2} + outside-zero."""
    rng = np.random.RandomState(seed)
    data = np.zeros((2, *shape), np.float32)
    inner = (slice(3, shape[0] - 2), slice(4, shape[1] - 3),
             slice(2, shape[2] - 4))
    data[0][inner] = rng.uniform(-80, 220, data[0][inner].shape)
    data[1][inner] = rng.normal(40, 12, data[1][inner].shape)
    seg = np.zeros((1, *shape), np.int8)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    r1 = np.sqrt((zz - 12) ** 2 + (yy - 14) ** 2 + (xx - 15) ** 2)
    seg[0][r1 < 6] = 1
    seg[0][r1 < 2.5] = 2
    seg[0][data[0] == 0] = 0
    return data, seg


class _DuckPlans:
    transpose_forward = [0, 1, 2]

    def __init__(self, intensity_props):
        self.foreground_intensity_properties_per_channel = intensity_props

    def get_label_manager(self, dataset_json):
        return _DuckLabels()


class _DuckLabels:
    has_regions = False
    has_ignore_label = False
    foreground_labels = [1, 2]


class _DuckConfig:
    def __init__(self, resampling_mod, spacing, schemes, use_mask):
        self.spacing = spacing
        self.normalization_schemes = schemes
        self.use_mask_for_norm = use_mask
        self._r = resampling_mod

    def resampling_fn_data(self, data, new_shape, cur, new):
        return self._r.resample_data_or_seg_to_shape(
            data, new_shape, cur, new, is_seg=False, order=3, order_z=0,
            force_separate_z=None)

    def resampling_fn_seg(self, seg, new_shape, cur, new):
        return self._r.resample_data_or_seg_to_shape(
            seg, new_shape, cur, new, is_seg=True, order=1, order_z=0,
            force_separate_z=None)


def main():
    cropping, resampling, norm, pre = _load_reference()
    intensity = {"0": {"mean": 70.0, "std": 88.0, "percentile_00_5": -74.0,
                       "percentile_99_5": 218.0},
                 "1": {"mean": 40.0, "std": 12.0, "percentile_00_5": 10.0,
                       "percentile_99_5": 75.0}}
    plans = _DuckPlans(intensity)
    dataset_json = {"labels": {"background": 0, "organ": 1, "vessel": 2}}
    p = pre.DefaultPreprocessor(verbose=False)
    out = {}

    for tag, spacing_in, spacing_out in [
            ("iso", (1.0, 1.0, 1.0), [1.5, 1.5, 1.5]),
            ("aniso", (4.0, 1.0, 1.0), [4.0, 1.2, 1.2])]:
        data, seg = make_case(seed=0 if tag == "iso" else 1)
        cfg = _DuckConfig(resampling, spacing_out,
                          ["CTNormalization", "ZScoreNormalization"],
                          [False, True])
        props = {"spacing": list(spacing_in)}
        d_out, s_out = p.run_case_npy(data.copy(), seg.copy(), props, plans,
                                      cfg, dataset_json)
        out[f"{tag}_in_data"] = data
        out[f"{tag}_in_seg"] = seg
        out[f"{tag}_data"] = d_out.astype(np.float32)
        out[f"{tag}_seg"] = s_out
        out[f"{tag}_bbox"] = np.asarray(props["bbox_used_for_cropping"])
        out[f"{tag}_shape_before_cropping"] = np.asarray(
            props["shape_before_cropping"])
        out[f"{tag}_shape_after_cropping"] = np.asarray(
            props["shape_after_cropping_and_before_resampling"])
        for cls, locs in props["class_locations"].items():
            out[f"{tag}_class_locs_{cls}"] = np.asarray(locs)

    # crop+normalize WITHOUT resampling (bit-identical target): same spacing
    data, seg = make_case(seed=2)
    cfg = _DuckConfig(resampling, [1.0, 1.0, 1.0],
                      ["CTNormalization", "ZScoreNormalization"],
                      [False, True])
    props = {"spacing": [1.0, 1.0, 1.0]}
    d_out, s_out = p.run_case_npy(data.copy(), seg.copy(), props, plans,
                                  cfg, dataset_json)
    out["noresample_in_data"] = data
    out["noresample_in_seg"] = seg
    out["noresample_data"] = d_out.astype(np.float32)
    out["noresample_seg"] = s_out
    out["noresample_bbox"] = np.asarray(props["bbox_used_for_cropping"])
    for cls, locs in props["class_locations"].items():
        out[f"noresample_class_locs_{cls}"] = np.asarray(locs)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1024:.0f} KiB): "
          f"{sorted(out)}")


if __name__ == "__main__":
    main()
