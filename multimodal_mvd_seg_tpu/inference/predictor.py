"""Sliding-window predictor.

Parity: reference nnunetv2/inference/predict_from_raw_data.py:37-714
(nnUNetPredictor), rebuilt as a TPU patch-batched scan: pad → static slicer
grid → tiles gathered with dynamic_slice inside a jitted lax.scan that runs
the (mirror-TTA-averaged) forward and Gaussian-weight-accumulates into an
HBM-resident fp32 logits buffer. The scan is sequential per tile batch, so
overlapping-tile accumulation is race-free by construction; tile batching
keeps the MXU full. One compile per padded-shape bucket."""

import itertools
import os
import pickle
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..plans.label_handling import determine_num_input_channels
from ..plans.plans_handler import PlansManager
from ..utils.files import join, isfile, load_json, subfiles, maybe_mkdir_p
from .sliding_window import (compute_gaussian, compute_steps_for_sliding_window,
                             pad_nd_image)


class MVDSegPredictor:
    def __init__(self, tile_step_size: float = 0.5, use_gaussian: bool = True,
                 use_mirroring: bool = True,
                 allowed_mirroring_axes: Optional[Tuple[int, ...]] = None,
                 tile_batch_size: int = 4, verbose: bool = False,
                 tta_mode: Optional[str] = None):
        self.tile_step_size = tile_step_size
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        self.allowed_mirroring_axes = allowed_mirroring_axes
        self.tile_batch_size = tile_batch_size
        self.verbose = verbose
        # "loop": the 2^n flip variants run as sequential forwards inside
        # the one jit (XLA pipelines them). "batched": all variants are
        # folded into the tile batch for ONE forward at 2^n x batch — the
        # flips are data-parallel, so this trades activation memory for
        # scheduling slack; pick per chip by A/B (env MVDSEG_TTA_MODE).
        self.tta_mode = tta_mode or os.environ.get("MVDSEG_TTA_MODE", "loop")

        self.network = None
        self.params_list: List[dict] = []
        self.plans_manager: Optional[PlansManager] = None
        self.configuration_manager = None
        self.dataset_json = None
        self.trainer_name = None
        self.label_manager = None
        self._jitted = {}

    # -------------------------------------------------------------- init

    def initialize_from_trained_model_folder(
            self, model_training_output_dir: str,
            use_folds: Union[Tuple[Union[int, str], ...], None] = None,
            checkpoint_name: str = "checkpoint_final.pkl"):
        """Restore plans/dataset.json/fold checkpoints and rebuild the network
        (reference predict_from_raw_data.py:67-129)."""
        if use_folds is None:
            use_folds = self.auto_detect_available_folds(
                model_training_output_dir, checkpoint_name)
        dataset_json = load_json(join(model_training_output_dir, "dataset.json"))
        plans = load_json(join(model_training_output_dir, "plans.json"))
        plans_manager = PlansManager(plans)

        if isinstance(use_folds, str):
            use_folds = [use_folds]
        params_list, checkpoint = [], None
        for f in use_folds:
            f = int(f) if f != "all" else f
            with open(join(model_training_output_dir, f"fold_{f}",
                           checkpoint_name), "rb") as fh:
                checkpoint = pickle.load(fh)
            if checkpoint.get("batch_stats"):
                # networks with BatchNorm (e.g. the MVD ContrastiveNet,
                # reference predict_from_raw_data2.py's dual-net restore)
                # need the running statistics alongside the weights
                params_list.append({"params": checkpoint["network_weights"],
                                    "batch_stats": checkpoint["batch_stats"]})
            else:
                params_list.append(checkpoint["network_weights"])

        configuration_manager = plans_manager.get_configuration(
            checkpoint["init_args"]["configuration"])
        trainer_name = checkpoint["trainer_name"]
        mirroring_axes = checkpoint.get("inference_allowed_mirroring_axes")

        from ..training.registry import get_trainer_class
        trainer_class = get_trainer_class(trainer_name)
        tmp_trainer = trainer_class(plans, checkpoint["init_args"]["configuration"],
                                    0, dataset_json)
        network = tmp_trainer.build_network_architecture(deep_supervision=False)
        overrides = checkpoint.get("network_overrides")
        if overrides:
            # imported reference checkpoints carry module-attribute
            # overrides (conv_padding="TORCH", transpconv_bias — see
            # model_sharing/torch_import.py::import_torch_model_folder)
            network = network.clone(**overrides)
        self.manual_initialization(network, plans_manager, configuration_manager,
                                   params_list, dataset_json, trainer_name,
                                   mirroring_axes)

    def manual_initialization(self, network, plans_manager: PlansManager,
                              configuration_manager, params_list: List[dict],
                              dataset_json: dict, trainer_name: str,
                              inference_allowed_mirroring_axes):
        """reference predict_from_raw_data.py:130-154 (used by in-training
        validation)."""
        self.network = network
        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.params_list = params_list
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        if self.allowed_mirroring_axes is None:
            self.allowed_mirroring_axes = inference_allowed_mirroring_axes
        self.label_manager = plans_manager.get_label_manager(dataset_json)

    @staticmethod
    def auto_detect_available_folds(model_training_output_dir, checkpoint_name):
        import re
        folds = []
        for d in os.listdir(model_training_output_dir):
            m = re.fullmatch(r"fold_(\d+|all)", d)
            if m and isfile(join(model_training_output_dir, d, checkpoint_name)):
                folds.append(m.group(1))
        assert folds, f"no folds with {checkpoint_name} found in " \
                      f"{model_training_output_dir}"
        return [int(f) if f != "all" else f for f in sorted(folds)]

    # -------------------------------------------------------- core predict

    def _mirror_forward(self, params, tiles):
        """Average logits over all combinations of allowed flip axes
        (reference _internal_maybe_mirror_and_predict :562-589).
        tiles: (b, *patch, c)."""
        net = self.network
        dim = tiles.ndim - 2
        axes_combos = [()]
        if self.use_mirroring and self.allowed_mirroring_axes:
            ax = [a + 1 for a in self.allowed_mirroring_axes if a < dim]
            axes_combos = [c for n in range(len(ax) + 1)
                           for c in itertools.combinations(ax, n)]
        # params_list entries are either bare param trees or full flax
        # variables dicts (e.g. {"params", "batch_stats"} for networks with
        # BatchNorm such as ContrastiveNet)
        variables = params if "params" in params else {"params": params}

        def fwd(t):
            o = net.apply(variables, t.astype(jnp.bfloat16), train=False)
            while isinstance(o, (list, tuple)):
                # deep-supervision list → finest head; dual-branch tuple
                # (logits1, logits2, fea1, fea2) → branch-1 logits
                o = o[0]
            return o

        if self.tta_mode == "batched" and len(axes_combos) > 1:
            stacked = jnp.concatenate(
                [jnp.flip(tiles, c) if c else tiles for c in axes_combos], 0)
            parts = jnp.split(fwd(stacked), len(axes_combos), 0)
            out = sum(jnp.flip(p, c) if c else p
                      for p, c in zip(parts, axes_combos))
        else:
            out = None
            for combo in axes_combos:
                o = fwd(jnp.flip(tiles, combo) if combo else tiles)
                o = jnp.flip(o, combo) if combo else o
                out = o if out is None else out + o
        return out / len(axes_combos)

    def _get_sliding_window_fn(self, padded_shape: Tuple[int, ...],
                               n_tiles_padded: int, num_channels: int,
                               num_heads: int):
        """Build/jit-cache the scan over tile batches for one padded shape."""
        key = (padded_shape, n_tiles_padded, num_channels, num_heads,
               self.tta_mode, self.use_mirroring,
               tuple(self.allowed_mirroring_axes or ()))
        if key in self._jitted:
            return self._jitted[key]

        patch = tuple(self.configuration_manager.patch_size)
        tb = self.tile_batch_size
        gaussian = jnp.asarray(compute_gaussian(patch)) if self.use_gaussian \
            else jnp.ones(patch, jnp.float32)

        @jax.jit
        def run(params, volume, coords, valid):
            # volume: (*padded_shape, c); coords: (n_pad, dim) int32;
            # valid: (n_pad,) bool (padding tiles contribute zero weight).
            # Accumulation buffers are HEADS-FIRST: a (..., num_heads) f32
            # buffer would put the tiny class axis on the TPU's 128-lane
            # minor dim and pad the volume-sized buffer up to 25x.
            logits = jnp.zeros((num_heads, *padded_shape), jnp.float32)
            weights = jnp.zeros(padded_shape, jnp.float32)
            n_batches = coords.shape[0] // tb

            dim = len(patch)

            def body(carry, idx):
                logits, weights = carry
                cs = jax.lax.dynamic_slice(coords, (idx * tb, 0),
                                           (tb, coords.shape[1]))
                vs = jax.lax.dynamic_slice(valid, (idx * tb,), (tb,))
                tiles = jax.vmap(
                    lambda c: jax.lax.dynamic_slice(
                        volume, tuple(c[d] for d in range(dim)) + (0,),
                        (*patch, num_channels)))(cs)
                preds = self._mirror_forward(params, tiles).astype(jnp.float32)
                preds = jnp.moveaxis(preds, -1, 1)   # (tb, heads, *patch)

                def accumulate(carry, i):
                    logits, weights = carry
                    c = tuple(cs[i, d] for d in range(dim))
                    g = jnp.where(vs[i], 1.0, 0.0)
                    cur = jax.lax.dynamic_slice(
                        logits, (0,) + c, (num_heads, *patch))
                    logits = jax.lax.dynamic_update_slice(
                        logits, cur + preds[i] * (gaussian * g)[None],
                        (0,) + c)
                    curw = jax.lax.dynamic_slice(weights, c, patch)
                    weights = jax.lax.dynamic_update_slice(
                        weights, curw + gaussian * g, c)
                    return (logits, weights), None

                (logits, weights), _ = jax.lax.scan(
                    accumulate, (logits, weights), jnp.arange(tb))
                return (logits, weights), None

            (logits, weights), _ = jax.lax.scan(
                body, (logits, weights), jnp.arange(n_batches))
            return logits / weights[None]

        self._jitted[key] = run
        return run

    def predict_preprocessed_case(self, data: np.ndarray) -> np.ndarray:
        """data: (c, *spatial) preprocessed. Returns logits
        (num_heads, *spatial) at preprocessed resolution, fold-ensembled
        (Σ logits / n, reference :464-526)."""
        patch = tuple(self.configuration_manager.patch_size)
        dim = len(patch)
        spatial = data.shape[1:]
        if dim == 2 and len(spatial) == 3:
            # 2d config on 3d volume: predict slice-wise
            slices = [self.predict_preprocessed_case(data[:, s])
                      for s in range(spatial[0])]
            return np.stack(slices, 1)

        # channels-last volume, padded
        vol = np.moveaxis(np.asarray(data, np.float32), 0, -1)
        padded, slicer = pad_nd_image(vol, (*patch, vol.shape[-1]))
        padded_spatial = padded.shape[:-1]

        steps = compute_steps_for_sliding_window(padded_spatial, patch,
                                                 self.tile_step_size)
        coords = np.array(list(itertools.product(*steps)), np.int32)
        n_tiles = len(coords)
        tb = self.tile_batch_size
        n_pad = int(np.ceil(n_tiles / tb) * tb)
        valid = np.zeros(n_pad, bool)
        valid[:n_tiles] = True
        coords_p = np.zeros((n_pad, dim), np.int32)
        coords_p[:n_tiles] = coords

        num_heads = self.label_manager.num_segmentation_heads
        try:
            fn = self._get_sliding_window_fn(tuple(padded_spatial), n_pad,
                                             vol.shape[-1], num_heads)
            vol_dev = jnp.asarray(padded)
            out = None
            for params in self.params_list:
                res = fn(params, vol_dev, jnp.asarray(coords_p),
                         jnp.asarray(valid))
                out = res if out is None else out + res
            out = jax.device_get(out) / len(self.params_list)
        except (RuntimeError, jax.errors.JaxRuntimeError) as e:
            # OOM resilience: fall back to host-side accumulation with
            # per-tile device forwards (the reference's GPU→CPU fallback,
            # predict_from_raw_data.py:499-505,686-698)
            if "RESOURCE_EXHAUSTED" not in str(e) and "memory" not in \
                    str(e).lower():
                raise
            if self.verbose:
                print("sliding-window buffer OOM on device — accumulating "
                      "on host")
            out = self._host_accumulate(padded, coords, patch, num_heads)
        # out is heads-first (num_heads, *padded_spatial)
        out = out[(slice(None),) + tuple(slicer[:-1])]  # revert padding
        return out

    def _host_accumulate(self, padded: np.ndarray, coords: np.ndarray,
                         patch, num_heads: int) -> np.ndarray:
        """Tile-by-tile device forward, Gaussian accumulation in host RAM."""
        gaussian = np.asarray(compute_gaussian(patch), np.float32) \
            if self.use_gaussian else np.ones(patch, np.float32)
        logits = np.zeros((*padded.shape[:-1], num_heads), np.float32)
        weights = np.zeros(padded.shape[:-1], np.float32)
        fwd = jax.jit(self._mirror_forward)
        for params in self.params_list:
            for c in coords:
                sl = tuple(slice(int(c[d]), int(c[d]) + patch[d])
                           for d in range(len(patch)))
                tile = jnp.asarray(padded[sl + (slice(None),)][None],
                                   jnp.bfloat16)
                pred = np.asarray(jax.device_get(fwd(params, tile))[0],
                                  np.float32)
                logits[sl] += pred * gaussian[..., None]
                weights[sl] += gaussian
        # weights accumulate once per fold too, so the quotient is already
        # the fold-averaged gaussian-weighted mean
        out = logits / np.maximum(weights, 1e-8)[..., None]
        return np.moveaxis(out, -1, 0)  # heads-first, like the device path

    # ---------------------------------------------------------- file-level

    def predict_from_files(self, list_of_lists_or_source_folder,
                           output_folder_or_list_of_truncated_output_files,
                           save_probabilities: bool = False,
                           overwrite: bool = True,
                           num_processes_preprocessing: int = 1,
                           num_processes_segmentation_export: int = 1,
                           folder_with_segs_from_prev_stage: Optional[str] = None):
        """End-to-end: read raw files → preprocess → sliding window → export
        (reference predict_from_files :206-425).

        OVERLAPPED PIPELINE (reference data_iterators.py:17-316 +
        predict_from_raw_data.py:347-425): preprocessing runs in
        ``num_processes_preprocessing`` background worker threads feeding a
        bounded prefetch window, and exports run asynchronously in
        ``num_processes_segmentation_export`` workers — the device never
        waits on host resampling between cases and never blocks on NIfTI
        writing. Threads (not processes) because the heavy host work is
        numpy/scipy which releases the GIL, and the device compute thread
        mostly blocks in XLA anyway; this sidesteps the reference's
        dead-worker liveness problem (SURVEY §5) entirely."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from ..preprocessing.preprocessor import DefaultPreprocessor
        from ..utils.dataset_files import create_lists_from_splitted_dataset_folder
        from .export import export_prediction_from_logits

        if isinstance(list_of_lists_or_source_folder, str):
            list_of_lists = create_lists_from_splitted_dataset_folder(
                list_of_lists_or_source_folder, self.dataset_json["file_ending"])
        else:
            list_of_lists = list_of_lists_or_source_folder

        if isinstance(output_folder_or_list_of_truncated_output_files, str):
            maybe_mkdir_p(output_folder_or_list_of_truncated_output_files)
            out_names = [
                join(output_folder_or_list_of_truncated_output_files,
                     os.path.basename(l[0]).replace(
                         "_0000" + self.dataset_json["file_ending"], ""))
                for l in list_of_lists]
        else:
            out_names = output_folder_or_list_of_truncated_output_files

        ending = self.dataset_json["file_ending"]
        cases = []
        for files, out_trunc in zip(list_of_lists, out_names):
            out_file = out_trunc if out_trunc.endswith(ending) \
                else out_trunc + ending
            # truncated-output-file lists may point into folders that don't
            # exist yet (reference predict_from_files does the same mkdir)
            maybe_mkdir_p(os.path.dirname(out_file) or ".")
            if not overwrite and isfile(out_file):
                continue
            seg_prev = None
            if folder_with_segs_from_prev_stage is not None:
                seg_prev = join(folder_with_segs_from_prev_stage,
                                os.path.basename(out_trunc) + ending)
            cases.append((files, seg_prev, out_file))

        def _prep(case):
            files, seg_prev, out_file = case
            preprocessor = DefaultPreprocessor(verbose=self.verbose)
            data, seg, properties = preprocessor.run_case(
                files, seg_prev, self.plans_manager,
                self.configuration_manager, self.dataset_json)
            if seg_prev is not None:
                from ..plans.label_handling import convert_labelmap_to_one_hot
                onehot = convert_labelmap_to_one_hot(
                    seg[0], self.label_manager.foreground_labels, data.dtype)
                data = np.vstack((data, onehot))
            return data, properties, out_file

        n_prep = max(1, int(num_processes_preprocessing))
        n_export = max(1, int(num_processes_segmentation_export))
        results, export_futures = [], []
        with ThreadPoolExecutor(n_prep) as prep_pool, \
                ThreadPoolExecutor(n_export) as export_pool:
            case_iter = iter(cases)
            pending = deque()
            # bounded prefetch: at most n_prep+1 cases preprocessed ahead
            # (backpressure — whole volumes are large)
            for case in itertools.islice(case_iter, n_prep + 1):
                pending.append(prep_pool.submit(_prep, case))
            while pending:
                data, properties, out_file = pending.popleft().result()
                nxt = next(case_iter, None)
                if nxt is not None:
                    pending.append(prep_pool.submit(_prep, nxt))
                logits = self.predict_preprocessed_case(data)
                # bounded export backlog: each queued entry retains a full
                # classes×volume logits array — without backpressure a slow
                # export (resample + gzip write) makes host memory grow with
                # case count (reference predict_from_raw_data.py:365-374
                # throttles on proceed_to_... the same way)
                while len([f for f in export_futures if not f.done()]) \
                        > n_export + 1:
                    next(f for f in export_futures if not f.done()).result()
                export_futures.append(export_pool.submit(
                    export_prediction_from_logits, logits, properties,
                    self.configuration_manager, self.plans_manager,
                    self.dataset_json, out_file,
                    save_probabilities=save_probabilities))
                results.append(out_file)
                if self.verbose:
                    print(f"predicted {out_file}")
            for fut in export_futures:
                fut.result()  # surface export errors
        return results


# legacy alias
nnUNetPredictor = MVDSegPredictor
