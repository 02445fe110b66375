"""Training orchestration.

Parity: reference nnunetv2/run/run_training.py (:32-409) — resolve the
trainer class by name, load plans/dataset.json, build the trainer,
optionally resume/load pretrained weights, train, then run the final
validation.

TPU re-design (reference :152-231): no process spawning and no NCCL — data
parallelism is a ``jax.sharding.Mesh`` over the visible devices inside ONE
process (``num_devices`` limits the data axis; XLA inserts the gradient
psums). Multi-host runs initialize ``jax.distributed`` from the environment
instead of MASTER_ADDR/mp.spawn.
"""

import re
from typing import Optional, Union

from .. import paths
from ..plans.plans_handler import PlansManager
from ..training.registry import get_trainer_class
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.files import isfile, join, load_json


def get_trainer_from_args(dataset_name_or_id: Union[int, str],
                          configuration: str, fold: Union[int, str],
                          trainer_name: str = "MVDSegTrainer",
                          plans_identifier: str = "nnUNetPlans",
                          specified_cfg: Optional[str] = None,
                          device: str = "auto"):
    """reference run_training.py:32-70."""
    trainer_class = get_trainer_class(trainer_name)
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    preprocessed = join(paths.get_preprocessed(), dataset_name)
    plans_file = join(preprocessed, plans_identifier + ".json")
    assert isfile(plans_file), (
        f"plans file missing: {plans_file} — run mvdseg_plan_and_preprocess "
        f"first")
    plans = load_json(plans_file)
    dataset_json = load_json(join(preprocessed, "dataset.json"))
    return trainer_class(plans, configuration, fold, dataset_json,
                         device=device, specified_cfg=specified_cfg)


def maybe_load_checkpoint(trainer, continue_training: bool,
                          validation_only: bool,
                          pretrained_weights_file: Optional[str] = None):
    """reference run_training.py:121-149: --c picks final→latest→best."""
    if continue_training and pretrained_weights_file is not None:
        raise RuntimeError("Cannot both continue a training AND load "
                           "pretrained weights.")
    expected = None
    if continue_training:
        for name in ("checkpoint_final.pkl", "checkpoint_latest.pkl",
                     "checkpoint_best.pkl"):
            if isfile(join(trainer.output_folder, name)):
                expected = join(trainer.output_folder, name)
                break
        if expected is None:
            print("WARNING: Cannot continue training - no checkpoint found. "
                  "Starting a new training...")
    elif validation_only:
        expected = join(trainer.output_folder, "checkpoint_final.pkl")
        if not isfile(expected):
            raise RuntimeError(
                "Cannot run validation because the training is not finished "
                f"yet! Missing: {expected}")
    elif pretrained_weights_file is not None:
        trainer.initialize()
        load_pretrained_weights(trainer, pretrained_weights_file)
    if expected is not None:
        trainer.load_checkpoint(expected)


# segmentation-head scopes are never transferred (reference
# load_pretrained_weights.py:21-23 skips '.seg_layers.'): the head maps
# features to the TARGET dataset's classes — even shape-coincident heads
# from another dataset are the wrong mapping
_SEG_HEAD_SCOPE = re.compile(r"^(seg\d+|out\d+_?)$")


def _load_pretrained_source(weights_file: str):
    """A checkpoint of this framework (.pkl) or a reference torch
    checkpoint (.pth/.pt — auto-converted via model_sharing/torch_import,
    architecture auto-detected), → (params_tree, batch_stats_tree)."""
    import pickle
    if weights_file.endswith((".pth", ".pt")):
        from ..model_sharing.torch_import import (contrastive_net_kwargs,
                                                  convert_contrastive_net,
                                                  convert_plain_conv_unet,
                                                  load_network_weights)
        w = load_network_weights(weights_file)
        if any(k.startswith("share_encoder.") for k in w):
            return convert_contrastive_net(
                w, contrastive_net_kwargs(w)["num_heads"])
        return convert_plain_conv_unet(w), {}
    with open(weights_file, "rb") as f:
        ckpt = pickle.load(f)
    source = ckpt["network_weights"] if "network_weights" in ckpt else ckpt
    return source, ckpt.get("batch_stats", {}) \
        if isinstance(ckpt, dict) else {}


def load_pretrained_weights(trainer, weights_file: str):
    """Load matching-shape parameters from another checkpoint (reference
    run_training.py pretrained-weights path + load_pretrained_weights.py).
    Accepts this framework's .pkl checkpoints AND reference torch .pth
    files (converted on the fly), enabling
    ``mvdseg_train … -pretrained_weights checkpoint_final.pth`` as the
    fine-tune-a-reference-model migration path. Segmentation heads are
    never transferred (reference semantics)."""
    import flax
    import numpy as np
    source, src_stats = _load_pretrained_source(weights_file)
    target = flax.serialization.to_state_dict(trainer.state.params)

    def merge(dst, src, depth=0):
        loaded, skipped = 0, 0
        for k, v in dst.items():
            if depth == 0 and _SEG_HEAD_SCOPE.match(k):
                skipped += _n_leaves(v)
                continue
            if k not in src:
                skipped += _n_leaves(v)
                continue
            if isinstance(v, dict):
                l, s = merge(v, src[k], depth + 1)
                loaded += l
                skipped += s
            elif np.shape(v) == np.shape(src[k]):
                dst[k] = src[k]
                loaded += 1
            else:
                skipped += 1
        return loaded, skipped

    def _n_leaves(t):
        return sum(_n_leaves(v) for v in t.values()) \
            if isinstance(t, dict) else 1

    loaded, skipped = merge(target, source)
    params = flax.serialization.from_state_dict(trainer.state.params, target)
    trainer.state = trainer.state.replace(params=params)
    stats_note = ""
    if src_stats and getattr(trainer.state, "batch_stats", None):
        tstats = flax.serialization.to_state_dict(trainer.state.batch_stats)
        sl, ss = merge(tstats, src_stats)
        trainer.state = trainer.state.replace(
            batch_stats=flax.serialization.from_state_dict(
                trainer.state.batch_stats, tstats))
        stats_note = f"; batch_stats: {sl} taken, {ss} skipped"
    trainer.print_to_log_file(
        f"Loaded pretrained weights from {weights_file}: {loaded} tensors "
        f"taken, {skipped} skipped (seg heads/shape/name){stats_note}")


def initialize_multi_host(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None):
    """Idempotent ``jax.distributed.initialize()`` wrapper. Arguments
    default to the environment (TPU pod metadata autodetection, or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    import jax
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return jax.process_index(), jax.process_count()


def run_training(dataset_name_or_id: Union[int, str], configuration: str,
                 fold: Union[int, str],
                 trainer_name: str = "MVDSegTrainer",
                 plans_identifier: str = "nnUNetPlans",
                 pretrained_weights: Optional[str] = None,
                 num_devices: Optional[int] = None,
                 export_validation_probabilities: bool = False,
                 continue_training: bool = False,
                 only_run_validation: bool = False,
                 disable_checkpointing: bool = False,
                 val_with_best: bool = False,
                 specified_cfg: Optional[str] = None,
                 device: str = "auto",
                 multi_host: bool = False):
    """reference run_training.py:186-252.

    multi_host=True initializes ``jax.distributed`` before anything touches
    the backend — the TPU-native replacement for the reference's
    MASTER_ADDR + mp.spawn + NCCL process group (:152-231). Launch the SAME
    command on every host; the coordinator is discovered from the standard
    environment (TPU pod metadata, or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID for CPU/GPU clusters). The mesh then
    spans all hosts' devices, each host feeds its slice of the global batch
    (PrefetchLoader + make_array_from_process_local_data), gradient psums
    ride ICI/DCN, and checkpoints/logs are written by process 0 only.
    """
    if multi_host:
        initialize_multi_host()
    if isinstance(fold, str) and fold != "all":
        fold = int(fold)

    trainer = get_trainer_from_args(dataset_name_or_id, configuration, fold,
                                    trainer_name, plans_identifier,
                                    specified_cfg, device)
    if num_devices is not None:
        trainer.n_data_parallel = num_devices
    if disable_checkpointing:
        trainer.save_checkpoint = lambda *a, **k: None

    maybe_load_checkpoint(trainer, continue_training, only_run_validation,
                          pretrained_weights)
    if not only_run_validation:
        trainer.run_training()
    if val_with_best:
        trainer.load_checkpoint(join(trainer.output_folder,
                                     "checkpoint_best.pkl"))
    return trainer.perform_actual_validation(
        save_probabilities=export_validation_probabilities)
