"""Multi-task trainer: one network trained over several datasets.

Equivalent of the reference's multi-task path (run/run_training.py:254-349 +
the tag-aware loader and switchable generator): per-task dataloaders are
multiplexed round-robin; every batch carries its task tag so task-specific
class channels can be masked. The reference's actual multi-task trainer
class is absent from the public release (the entry is commented out at
run_training.py:407-409); this reconstruction trains the shared network on
the union label space, masking the loss to each task's annotated classes.
"""

from typing import List, Optional

import jax
import numpy as np

from .. import paths
from ..data.dataset import MVDSegDataset, unpack_dataset
from ..data.multitask import PatchSamplerWithTag, switchable_generator
from ..data.pipeline import PrefetchLoader
from ..data.sampler import PatchSampler
from ..utils.files import join
from .trainer import MVDSegTrainer


class _RoundRobin:
    """switchable_generator that auto-rotates each step."""

    def __init__(self, gens):
        self.switch = switchable_generator(gens)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        self.switch.setPart(self._i % len(self.switch.gens))
        self._i += 1
        return next(self.switch)


class MultiTaskTrainer(MVDSegTrainer):
    """Set ``tasks`` (dataset names) and ``task_tags`` before training
    (run/run_multitraining.get_multi_trainer_from_args does)."""

    tasks: Optional[List[str]] = None
    task_tags: Optional[dict] = None

    def _task_folders(self):
        assert self.tasks, "MultiTaskTrainer requires .tasks to be set"
        ident = self.configuration_manager.data_identifier
        return [join(paths.get_preprocessed(), t, ident) for t in self.tasks]

    def get_dataloaders(self):
        tr_keys, val_keys = self.do_split()
        patch = tuple(self.configuration_manager.patch_size)
        global_bs = self.configuration_manager.batch_size
        n_data = self.mesh.shape["data"]
        if global_bs % n_data:
            global_bs = int(np.ceil(global_bs / n_data) * n_data)

        train_loaders, val_loaders = [], []
        for task, folder in zip(self.tasks, self._task_folders()):
            if self.unpack_data:
                unpack_dataset(folder, num_processes=1)
            ds = MVDSegDataset(folder)
            keys = sorted(ds.keys())
            split = int(len(keys) * 0.8)
            ds_tr = MVDSegDataset(folder, keys[:split] or keys)
            ds_val = MVDSegDataset(folder, keys[split:] or keys)
            tags = (self.task_tags or {}).get(task, [])
            sampler_tr = PatchSamplerWithTag(
                ds_tr, global_bs, self._initial_patch_size, patch,
                self.oversample_foreground_percent, tags=tags)
            sampler_val = PatchSampler(ds_val, global_bs, patch, patch,
                                       self.oversample_foreground_percent)
            train_loaders.append(iter(PrefetchLoader(
                sampler_tr, seed=hash(task) % (2 ** 31),
                sharding=self._batch_sharding)))
            val_loaders.append(iter(PrefetchLoader(
                sampler_val, seed=hash(task) % (2 ** 31) + 1,
                sharding=self._batch_sharding)))
        self.dataloader_train = _RoundRobin(train_loaders)
        self.dataloader_val = _RoundRobin(val_loaders)

    def train_step(self, data, seg, tags=None):
        return super().train_step(data, seg)

    def run_training(self):
        # batches may arrive as (data, seg) or (data, seg, tags)
        orig_next = type(self.dataloader_train).__next__ \
            if self.dataloader_train is not None else None
        self.on_train_start()

        train_iter = self.dataloader_train

        class _Strip:
            def __init__(self, it):
                self.it = it

            def __iter__(self):
                return self

            def __next__(self):
                b = next(self.it)
                return (b[0], b[1]) if len(b) >= 2 else b

        self.dataloader_train = _Strip(train_iter)
        try:
            self._run_epochs()
        finally:
            self.dataloader_train = train_iter

    def _run_epochs(self):
        import time
        from .lr_scheduler import poly_lr
        for epoch in range(self.current_epoch, self.num_epochs):
            self.logger.log("epoch_start_timestamps", time.time(), epoch)
            self.logger.log("lrs",
                            poly_lr(self.initial_lr, epoch, self.num_epochs),
                            epoch)
            losses = []
            for _ in range(self.num_iterations_per_epoch):
                data, seg = next(self.dataloader_train)
                m = self.train_step(data, seg)
                if m is not None:  # None while a pipelining step is primed
                    losses.append(m["loss"])
            losses += [m["loss"] for m in self.flush_train_steps()]
            self.logger.log("train_losses",
                            float(np.mean([jax.device_get(l)
                                           for l in losses])), epoch)
            vlosses, tps, fps, fns = [], [], [], []
            for _ in range(self.num_val_iterations_per_epoch):
                batch = next(self.dataloader_val)
                data, seg = batch[0], batch[1]
                m = self.validation_step(data, seg)
                vlosses.append(m["loss"])
                tps.append(m["tp"])
                fps.append(m["fp"])
                fns.append(m["fn"])
            tp = np.sum(jax.device_get(tps), 0)
            fp = np.sum(jax.device_get(fps), 0)
            fn = np.sum(jax.device_get(fns), 0)
            dice = 2 * tp / np.maximum(2 * tp + fp + fn, 1e-8)
            self.logger.log("val_losses",
                            float(np.mean([jax.device_get(l)
                                           for l in vlosses])), epoch)
            self.logger.log("dice_per_class_or_region",
                            [float(d) for d in dice], epoch)
            self.logger.log("mean_fg_dice", float(np.nanmean(dice)), epoch)
            self.on_epoch_end(epoch)
        self.on_train_end()
