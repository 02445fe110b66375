"""plan_and_preprocess orchestration API.

Parity: reference nnunetv2/experiment_planning/plan_and_preprocess_api.py
(:35,74,136): fingerprint → plan → preprocess pipelines, usable separately or
end-to-end."""

from typing import List, Optional, Union

from ..configuration import default_num_processes
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from .fingerprint import DatasetFingerprintExtractor
from .planner import get_planner_class_by_name
from .verify_integrity import verify_dataset_integrity


def extract_fingerprint_dataset(dataset_id: Union[int, str],
                                num_processes: int = default_num_processes,
                                check_dataset_integrity: bool = False,
                                clean: bool = True, verbose: bool = True):
    if check_dataset_integrity:
        verify_dataset_integrity(dataset_id, num_processes)
    return DatasetFingerprintExtractor(dataset_id, num_processes,
                                       verbose=verbose).run(overwrite_existing=clean)


def extract_fingerprints(dataset_ids: List[int],
                         num_processes: int = default_num_processes,
                         check_dataset_integrity: bool = False,
                         clean: bool = True, verbose: bool = True):
    for d in dataset_ids:
        extract_fingerprint_dataset(d, num_processes, check_dataset_integrity,
                                    clean, verbose)


def plan_experiment_dataset(dataset_id: Union[int, str],
                            experiment_planner_name: str = 'ExperimentPlanner',
                            gpu_memory_target_in_gb: float = 8,
                            preprocess_class_name: str = 'DefaultPreprocessor',
                            overwrite_target_spacing: Optional[List[float]] = None,
                            overwrite_plans_name: Optional[str] = None) -> dict:
    planner_cls = get_planner_class_by_name(experiment_planner_name)
    kwargs = {}
    if overwrite_plans_name is not None:
        kwargs['plans_name'] = overwrite_plans_name
    planner = planner_cls(dataset_id,
                          gpu_memory_target_in_gb=gpu_memory_target_in_gb,
                          preprocessor_name=preprocess_class_name,
                          overwrite_target_spacing=overwrite_target_spacing,
                          **kwargs)
    return planner.plan_experiment()


def plan_experiments(dataset_ids: List[int],
                     experiment_planner_name: str = 'ExperimentPlanner',
                     gpu_memory_target_in_gb: float = 8,
                     preprocess_class_name: str = 'DefaultPreprocessor',
                     overwrite_target_spacing: Optional[List[float]] = None,
                     overwrite_plans_name: Optional[str] = None):
    for d in dataset_ids:
        plan_experiment_dataset(d, experiment_planner_name, gpu_memory_target_in_gb,
                                preprocess_class_name, overwrite_target_spacing,
                                overwrite_plans_name)


def preprocess_dataset(dataset_id: Union[int, str],
                       plans_identifier: str = 'nnUNetPlans',
                       configurations=('2d', '3d_fullres', '3d_lowres'),
                       num_processes=(8, 4, 8),
                       verbose: bool = False):
    from .. import paths
    from ..plans.plans_handler import PlansManager
    from ..utils.files import join, isfile

    if not isinstance(num_processes, (list, tuple)):
        num_processes = [num_processes] * len(configurations)
    if len(num_processes) == 1:
        num_processes = list(num_processes) * len(configurations)
    assert len(num_processes) == len(configurations)

    dataset_name = maybe_convert_to_dataset_name(dataset_id)
    plans_file = join(paths.get_preprocessed(), dataset_name,
                      plans_identifier + '.json')
    assert isfile(plans_file), f"plans file missing: {plans_file}"
    plans_manager = PlansManager(plans_file)
    for n, c in zip(num_processes, configurations):
        if c not in plans_manager.available_configurations:
            print(f"Configuration {c} not found in plans of {dataset_name} — "
                  f"skipping.")
            continue
        configuration_manager = plans_manager.get_configuration(c)
        preprocessor = configuration_manager.preprocessor_class(verbose=verbose)
        preprocessor.run(dataset_id, c, plans_identifier, num_processes=n)


def preprocess(dataset_ids: List[int], plans_identifier: str = 'nnUNetPlans',
               configurations=('2d', '3d_fullres', '3d_lowres'),
               num_processes=(8, 4, 8), verbose: bool = False):
    for d in dataset_ids:
        preprocess_dataset(d, plans_identifier, configurations, num_processes,
                           verbose)


def plan_and_preprocess(dataset_ids: List[int], **kwargs):
    extract_fingerprints(dataset_ids,
                         check_dataset_integrity=kwargs.pop(
                             'check_dataset_integrity', False))
    plan_experiments(dataset_ids)
    preprocess(dataset_ids, **kwargs)
