"""Device-resident dataset cache: on-device patch gather must reproduce the
host PatchSampler pipeline (coordinate-sampling parity + voxel parity)."""

import numpy as np
import pytest

from multimodal_mvd_seg_tpu.data.device_cache import DeviceCachedLoader
from multimodal_mvd_seg_tpu.data.sampler import PatchSampler


def _preprocess(prepared_dataset_shared):
    # consumes the session-preprocessed artifacts (tests/conftest.py)
    import os
    from multimodal_mvd_seg_tpu.data.dataset import MVDSegDataset
    pre = os.path.join(prepared_dataset_shared["preprocessed"],
                       prepared_dataset_shared["dataset_name"])
    import json
    plans = json.load(open(os.path.join(pre, "nnUNetPlans.json")))
    folder = os.path.join(
        pre, plans["configurations"]["3d_fullres"]["data_identifier"])
    return MVDSegDataset(folder)


def test_device_cache_matches_host_sampler(prepared_dataset_shared):
    ds = _preprocess(prepared_dataset_shared)
    # patch larger than some axes exercises the need_to_pad offset path
    sampler = PatchSampler(ds, batch_size=3, patch_size=(20, 24, 40),
                           oversample_foreground_percent=0.33)
    loader = DeviceCachedLoader(sampler, seed=7, cache_dtype=np.float32)
    for step in range(4):
        d_dev, s_dev = next(loader)
        rng = np.random.RandomState((7 * 1000003 + step) % (2 ** 31 - 1))
        d_host, s_host = sampler.generate_batch(rng)
        np.testing.assert_array_equal(np.asarray(s_dev), s_host)
        np.testing.assert_allclose(np.asarray(d_dev), d_host, atol=0)


def test_device_cache_f16_tolerance(prepared_dataset_shared):
    ds = _preprocess(prepared_dataset_shared)
    sampler = PatchSampler(ds, batch_size=2, patch_size=(16, 16, 16))
    loader = DeviceCachedLoader(sampler, seed=3)  # default f16 cache
    d_dev, s_dev = next(loader)
    rng = np.random.RandomState((3 * 1000003 + 0) % (2 ** 31 - 1))
    d_host, s_host = sampler.generate_batch(rng)
    np.testing.assert_array_equal(np.asarray(s_dev), s_host)
    # z-scored intensities: f16 rounding only
    np.testing.assert_allclose(np.asarray(d_dev), d_host,
                               rtol=1e-3, atol=1e-3)


def test_supports_gating(prepared_dataset_shared):
    ds = _preprocess(prepared_dataset_shared)
    s3 = PatchSampler(ds, 2, (16, 16, 16))
    assert DeviceCachedLoader.supports(s3)
    assert not DeviceCachedLoader.supports(s3, budget_bytes=10)
    s2 = PatchSampler(ds, 2, (16, 16), dim=2)
    assert not DeviceCachedLoader.supports(s2)
    sc = PatchSampler(ds, 2, (16, 16, 16), cascade_foreground_labels=[1, 2])
    assert not DeviceCachedLoader.supports(sc)
    with pytest.raises(ValueError):
        DeviceCachedLoader(s2)


def test_device_cache_odd_need_parity(prepared_dataset_shared):
    """Odd need_to_pad axes: _get_bbox draws lbs down to -ceil(need/2)
    (Python floor on the negated value), so the cache must pad ceil(need/2)
    on BOTH sides — floor padding clamps the dynamic_slice start and shifts
    the patch one voxel (round-2 review finding)."""
    ds = _preprocess(prepared_dataset_shared)
    # odd patch dims force odd need on every axis of every case
    sampler = PatchSampler(ds, batch_size=4, patch_size=(21, 29, 35),
                           oversample_foreground_percent=0.33)
    loader = DeviceCachedLoader(sampler, seed=11, cache_dtype=np.float32)
    hit_negative = False
    for step in range(6):
        d_dev, s_dev = next(loader)
        rng = np.random.RandomState((11 * 1000003 + step) % (2 ** 31 - 1))
        d_host, s_host = sampler.generate_batch(rng)
        np.testing.assert_array_equal(np.asarray(s_dev), s_host)
        np.testing.assert_allclose(np.asarray(d_dev), d_host, atol=0)
        # confirm the negative-lbs extreme actually occurred this run
        rng2 = np.random.RandomState((11 * 1000003 + step) % (2 ** 31 - 1))
        idx, starts = loader._sample_coords(rng2)
        for j, i in enumerate(idx):
            if np.any(starts[j] - loader._pad_fronts[i] < 0):
                hit_negative = True
    assert hit_negative


def test_case_shape_without_voxel_loads(prepared_dataset_shared):
    """MVDSegDataset.case_shape reads npy/npz headers only; supports()'s
    byte estimate must use it (no dataset decompression on eligibility
    probes)."""
    from multimodal_mvd_seg_tpu.data.dataset import MVDSegDataset, unpack_dataset
    ds = _preprocess(prepared_dataset_shared)
    key = next(iter(ds.keys()))
    data, _, props = ds.load_case(key)
    # npz path (preprocessed output is packed)
    shape, c, props2 = ds.case_shape(key)
    assert shape == data.shape[1:] and c == data.shape[0]
    assert props2.keys() == props.keys()
    # unpacked npy path
    import os
    folder = os.path.dirname(ds[key]["data_file"])
    unpack_dataset(folder, unpack_segmentation=True,
                   overwrite_existing=False, num_processes=1)
    shape, c, _ = ds.case_shape(key)
    assert shape == data.shape[1:] and c == data.shape[0]
