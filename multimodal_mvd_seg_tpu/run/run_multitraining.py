"""Multi-task training orchestration.

Parity: reference run/run_training.py:73-119 (get_multi_trainer_from_args)
and :254-349 (run_multitraining): train one network over several datasets
("tasks"), round-robining their dataloaders with task tags (the class-name
lists read from each dataset.json, background excluded). The reference
wires this to a commented-out CLI entry (:407-409) and hardcodes tasks
["404", "400"]; here the task list is an argument.
"""

from typing import List, Optional, Union

from .. import paths
from ..data.dataset import MVDSegDataset
from ..data.multitask import PatchSamplerWithTag, switchable_generator
from ..training.registry import get_trainer_class
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.files import join, load_json
from .run_training import maybe_load_checkpoint


def task_class_dict(tasks: List[Union[int, str]]) -> dict:
    """Per-task foreground class names (reference :276-305)."""
    classes_dict = {}
    names = []
    for t in tasks:
        name = maybe_convert_to_dataset_name(t)
        names.append(name)
        d = load_json(join(paths.get_preprocessed(), name, "dataset.json"))
        classes = [k for k, v in d["labels"].items()
                   if (v if isinstance(v, int) else v[0]) != 0]
        classes_dict[name] = classes
    return dict(zip(names, [classes_dict[n] for n in names]))


def get_multi_trainer_from_args(dataset_name_or_id, configuration: str,
                                fold: Union[int, str],
                                tasks: List[Union[int, str]],
                                trainer_name: str = "MultiTaskTrainer",
                                plans_identifier: str = "nnUNetPlans",
                                specified_cfg: Optional[str] = None,
                                device: str = "auto"):
    """reference run_training.py:73-119."""
    classes_dict = task_class_dict(tasks)
    trainer_class = get_trainer_class(trainer_name)
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    preprocessed = join(paths.get_preprocessed(), dataset_name)
    plans = load_json(join(preprocessed, plans_identifier + ".json"))
    dataset_json = load_json(join(preprocessed, "dataset.json"))
    trainer = trainer_class(plans, configuration, fold, dataset_json,
                            device=device, specified_cfg=specified_cfg)
    trainer.tasks = [maybe_convert_to_dataset_name(t) for t in tasks]
    trainer.task_tags = classes_dict
    return trainer


def run_multitraining(dataset_name_or_id, configuration: str,
                      fold: Union[int, str],
                      tasks: List[Union[int, str]],
                      trainer_name: str = "MultiTaskTrainer",
                      plans_identifier: str = "nnUNetPlans",
                      pretrained_weights: Optional[str] = None,
                      num_devices: Optional[int] = None,
                      export_validation_probabilities: bool = False,
                      continue_training: bool = False,
                      only_run_validation: bool = False,
                      disable_checkpointing: bool = False,
                      specified_cfg: Optional[str] = None,
                      device: str = "auto"):
    """reference run_training.py:254-349 (single-process TPU form)."""
    if isinstance(fold, str) and fold != "all":
        fold = int(fold)
    trainer = get_multi_trainer_from_args(
        dataset_name_or_id, configuration, fold, tasks, trainer_name,
        plans_identifier, specified_cfg, device)
    if num_devices is not None:
        trainer.n_data_parallel = num_devices
    if disable_checkpointing:
        trainer.save_checkpoint = lambda *a, **k: None
    maybe_load_checkpoint(trainer, continue_training, only_run_validation,
                          pretrained_weights)
    if not only_run_validation:
        trainer.run_training()
    return trainer.perform_actual_validation(
        save_probabilities=export_validation_probabilities)
