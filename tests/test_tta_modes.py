"""Mirror-TTA execution modes: the "batched" mode (all flip variants folded
into the tile batch, one forward) must equal the "loop" mode (sequential
forwards) — same math, different schedule (VERDICT.md round-2 item 4)."""

import jax.numpy as jnp
import numpy as np

from multimodal_mvd_seg_tpu.inference.predictor import MVDSegPredictor


class _FlipSensitiveNet:
    """Stand-in network whose output is NOT flip-equivariant, so TTA
    averaging actually mixes distinct values."""

    def apply(self, variables, x, train=False):
        w = variables["params"]["w"]
        return jnp.tanh(x * w + jnp.cumsum(x, axis=1))


def test_batched_tta_matches_loop():
    rs = np.random.RandomState(0)
    tiles = jnp.asarray(rs.normal(size=(3, 6, 6, 6, 2)), jnp.float32)
    params = {"params": {"w": jnp.float32(0.7)}}

    outs = {}
    for mode in ("loop", "batched"):
        p = MVDSegPredictor(use_mirroring=True,
                            allowed_mirroring_axes=(0, 1, 2), tta_mode=mode)
        p.network = _FlipSensitiveNet()
        outs[mode] = np.asarray(p._mirror_forward(params, tiles))

    np.testing.assert_allclose(outs["batched"], outs["loop"],
                               rtol=1e-5, atol=1e-6)
    # and TTA is not a no-op on this net
    p = MVDSegPredictor(use_mirroring=False, tta_mode="loop")
    p.network = _FlipSensitiveNet()
    plain = np.asarray(p._mirror_forward(params, tiles))
    assert np.abs(plain - outs["loop"]).max() > 1e-3


class _CM:
    def __init__(self, patch):
        self.patch_size = list(patch)


class _LM:
    def __init__(self, heads):
        self.num_segmentation_heads = heads


class _SpatialNet:
    """(b, *patch, c) -> (b, *patch, heads): flip-sensitive via cumsum
    along every spatial axis, so TTA averaging mixes distinct values and
    any mis-flip/mis-pad in the batched mode shows up."""

    def __init__(self, heads):
        self.heads = heads

    def apply(self, variables, x, train=False):
        w = variables["params"]["w"]
        base = x * w
        for ax in range(1, x.ndim - 1):
            base = base + 0.1 * jnp.cumsum(x, axis=ax)
        r = jnp.mean(base, axis=-1, keepdims=True)
        return jnp.concatenate(
            [jnp.tanh(r * (i + 1)) for i in range(self.heads)], -1)


def _mk_predictor(mode, patch, heads, tile_batch):
    p = MVDSegPredictor(use_mirroring=True,
                        allowed_mirroring_axes=tuple(range(len(patch))),
                        tta_mode=mode, verbose=False)
    p.network = _SpatialNet(heads)
    p.params_list = [{"params": {"w": jnp.float32(0.7)}}]
    p.configuration_manager = _CM(patch)
    p.label_manager = _LM(heads)
    p.tile_batch_size = tile_batch
    return p


def _assert_modes_equal(patch, vol_shape, heads, tile_batch):
    rs = np.random.RandomState(1)
    data = rs.normal(size=vol_shape).astype(np.float32)
    outs = {m: _mk_predictor(m, patch, heads,
                             tile_batch).predict_preprocessed_case(data)
            for m in ("loop", "batched")}
    assert outs["loop"].shape == (heads, *vol_shape[1:])
    np.testing.assert_allclose(outs["batched"], outs["loop"],
                               rtol=2e-5, atol=2e-5)


def test_batched_tta_odd_tile_count_full_pipeline():
    """End-to-end sliding window, 3 tiles with tile_batch 2 (one padding
    tile): the batched mode's 2^3 flip variants folded into the padded
    tile batch must equal the loop mode exactly (VERDICT r3 weak #5)."""
    _assert_modes_equal(patch=(8, 8, 8), vol_shape=(2, 8, 8, 14),
                        heads=3, tile_batch=2)


def test_batched_tta_2d_config():
    """2D configuration on a 3D volume (slice-wise path) with 2D mirror
    axes."""
    _assert_modes_equal(patch=(8, 8), vol_shape=(1, 3, 9, 9),
                        heads=2, tile_batch=4)


def test_batched_tta_regions_style_heads():
    """Regions-mode head count (sigmoid nonlin downstream consumes these
    logits unchanged — equality here pins the whole regions path)."""
    _assert_modes_equal(patch=(8, 8, 8), vol_shape=(2, 10, 12, 9),
                        heads=2, tile_batch=3)
