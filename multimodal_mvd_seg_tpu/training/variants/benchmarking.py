"""Benchmark trainers.

Parity: reference variants/benchmarking/nnUNetTrainerBenchmark_5epochs.py
(:10-64) — 5 epochs, no checkpointing/validation, record the fastest epoch
time with device metadata in ``benchmark_result.json``; the
``_noDataLoading`` variant feeds one fixed device-resident dummy batch so
pure device compute is isolated from the input pipeline
(documentation/benchmarking.md:14-19).
"""

import jax
import numpy as np

from ..trainer import MVDSegTrainer
from ...utils.files import isfile, join, load_json, save_json


class nnUNetTrainerBenchmark_5epochs(MVDSegTrainer):
    def __init__(self, plans, configuration, fold, dataset_json,
                 unpack_data=True, device="auto", specified_cfg=None):
        super().__init__(plans, configuration, fold, dataset_json,
                         unpack_data, device, specified_cfg)
        assert self.fold == 0, (
            "It makes absolutely no sense to specify a certain fold. Stick "
            "with 0 so that we can parse the results.")
        self.num_epochs = 5
        self.crashed_with_runtime_error = False

    def perform_actual_validation(self, save_probabilities: bool = False):
        pass

    def save_checkpoint(self, filename: str) -> None:
        pass

    def run_training(self):
        try:
            super().run_training()
        except RuntimeError:
            self.crashed_with_runtime_error = True
        self._write_benchmark_result()

    def _write_benchmark_result(self):
        L = self.logger.my_fantastic_logging
        if self.crashed_with_runtime_error:
            fastest_epoch = "Not enough memory!"
        else:
            fastest_epoch = min(e - s for e, s in
                                zip(L["epoch_end_timestamps"],
                                    L["epoch_start_timestamps"]))
        dev = jax.devices()[0]
        n_dev = self.mesh.size if self.mesh is not None else 1
        key = (f"{jax.__version__}__{dev.platform}_"
               f"{dev.device_kind.replace(' ', '')}__devices_{n_dev}")
        f = join(self.output_folder, "benchmark_result.json")
        results = load_json(f) if isfile(f) else {}
        results[key] = {
            "jax_version": jax.__version__,
            "backend": dev.platform,
            "device_kind": dev.device_kind,
            "fastest_epoch": fastest_epoch,
            "num_devices": n_dev,
        }
        save_json(results, f)


class nnUNetTrainerBenchmark_5epochs_noDataLoading(
        nnUNetTrainerBenchmark_5epochs):
    """Replaces the dataloaders with one fixed device batch."""

    def get_dataloaders(self):
        rng = np.random.RandomState(0)
        patch = tuple(self._initial_patch_size)
        final = tuple(self.configuration_manager.patch_size)
        bs = self.configuration_manager.batch_size
        n_data = self.mesh.shape["data"]
        if bs % n_data:
            bs = int(np.ceil(bs / n_data) * n_data)
        num_classes = self.label_manager.num_segmentation_heads
        data = jax.device_put(
            rng.normal(size=(bs, self.num_input_channels, *patch))
            .astype(np.float32), self._batch_sharding)
        seg = jax.device_put(
            rng.randint(0, num_classes, (bs, *patch)).astype(np.int32),
            self._batch_sharding)
        vdata = jax.device_put(
            rng.normal(size=(bs, self.num_input_channels, *final))
            .astype(np.float32), self._batch_sharding)
        vseg = jax.device_put(
            rng.randint(0, num_classes, (bs, *final)).astype(np.int32),
            self._batch_sharding)

        def forever(pair):
            while True:
                yield pair

        self.dataloader_train = forever((data, seg))
        self.dataloader_val = forever((vdata, vseg))
