"""Model selection across trainers/plans/configurations (+2-model ensembles).

Parity: reference nnunetv2/evaluation/find_best_configuration.py:81-213 —
merge each candidate's 5-fold cross-validation predictions, optionally build
all 2-model ensembles, score everything by mean foreground Dice, determine
postprocessing for the winner and write ``inference_information.json`` plus
a human-readable ``inference_instructions.txt``.
"""

import itertools
from typing import List, Optional, Union

import numpy as np

from .. import paths
from ..configuration import default_num_processes
from ..ensembling.ensemble import ensemble_crossvalidations
from ..plans.plans_handler import PlansManager
from ..postprocessing.remove_connected_components import (
    determine_postprocessing)
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.files import isdir, isfile, join, load_json, save_json
from .accumulate_cv_results import accumulate_cv_results, folds_tuple_to_string
from .evaluate import compute_metrics_on_folder


def default_trained_models(trainers=("MVDSegTrainer",),
                           plans=("nnUNetPlans",),
                           configurations=("2d", "3d_fullres", "3d_lowres",
                                           "3d_cascade_fullres")):
    """The candidate grid (reference :25-42 uses nnUNetTrainer/nnUNetPlans ×
    four configurations)."""
    return [{"trainer": t, "plans": p, "configuration": c}
            for t in trainers for p in plans for c in configurations]


def _model_folder(dataset_name: str, spec: dict) -> str:
    return join(paths.get_results(), dataset_name,
                f"{spec['trainer']}__{spec['plans']}__{spec['configuration']}")


def find_best_configuration(dataset_name_or_id,
                            allowed_trained_models: Optional[List[dict]] = None,
                            allow_ensembling: bool = True,
                            num_processes: int = default_num_processes,
                            overwrite: bool = True,
                            folds: Union[List[int], tuple] = (0, 1, 2, 3, 4),
                            strict: bool = False) -> dict:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    if allowed_trained_models is None:
        allowed_trained_models = default_trained_models()

    # keep only models that were actually trained
    existing = []
    for spec in allowed_trained_models:
        folder = _model_folder(dataset_name, spec)
        if all(isdir(join(folder, f"fold_{f}")) for f in folds):
            existing.append({**spec, "folder": folder})
        elif strict:
            raise RuntimeError(f"Requested model not trained: {folder}")
    assert existing, "No trained models found to choose from"

    results = {}
    # single models: merge CV folds + evaluate
    for spec in existing:
        merged = join(spec["folder"],
                      f"crossval_results_folds_{folds_tuple_to_string(folds)}")
        if overwrite or not isfile(join(merged, "summary.json")):
            accumulate_cv_results(spec["folder"], merged, folds,
                                  num_processes, overwrite)
        summary = load_json(join(merged, "summary.json"))
        key = (f"{spec['trainer']}__{spec['plans']}__"
               f"{spec['configuration']}")
        results[key] = {
            "source": "single", "spec": {k: spec[k] for k in
                                         ("trainer", "plans", "configuration")},
            "folder": merged,
            "mean_fg_dice": summary["foreground_mean"]["Dice"],
        }

    # pairwise ensembles
    if allow_ensembling and len(existing) > 1:
        for a, b in itertools.combinations(existing, 2):
            name = ("ensemble___" +
                    f"{a['trainer']}__{a['plans']}__{a['configuration']}___" +
                    f"{b['trainer']}__{b['plans']}__{b['configuration']}___" +
                    folds_tuple_to_string(folds))
            out = join(paths.get_results(), dataset_name, "ensembles", name)
            if overwrite or not isfile(join(out, "summary.json")):
                try:
                    ensemble_crossvalidations([a["folder"], b["folder"]], out,
                                              folds, num_processes)
                except AssertionError as e:
                    print(f"skipping ensemble {name}: {e}")
                    continue
                dataset_json = load_json(join(out, "dataset.json"))
                pm = PlansManager(load_json(join(out, "plans.json")))
                lm = pm.get_label_manager(dataset_json)
                gt = join(paths.get_preprocessed(), dataset_name,
                          "gt_segmentations")
                if not isdir(gt):
                    gt = join(paths.get_raw(), dataset_name, "labelsTr")
                labels = lm.foreground_regions if lm.has_regions \
                    else lm.foreground_labels
                compute_metrics_on_folder(
                    gt, out, join(out, "summary.json"),
                    pm.image_reader_writer_class(),
                    dataset_json["file_ending"], labels, lm.ignore_label,
                    num_processes)
            summary = load_json(join(out, "summary.json"))
            results[name] = {"source": "ensemble", "folder": out,
                             "spec": [a["folder"], b["folder"]],
                             "mean_fg_dice":
                                 summary["foreground_mean"]["Dice"]}

    def _score(k):
        # summary.json stores NaN as null (json has no NaN) — rank those
        # (and NaN) last instead of crashing the float/None comparison
        v = results[k]["mean_fg_dice"]
        return float(v) if isinstance(v, (int, float)) \
            and not np.isnan(v) else -np.inf

    best_key = max(results, key=_score)
    best = results[best_key]
    print(f"Best: {best_key} (mean fg Dice "
          f"{best['mean_fg_dice']:.4f})")

    # postprocessing for the winner
    gt = join(paths.get_preprocessed(), dataset_name, "gt_segmentations")
    if not isdir(gt):
        gt = join(paths.get_raw(), dataset_name, "labelsTr")
    pp_fns, pp_fn_kwargs = determine_postprocessing(
        best["folder"], gt,
        plans_file_or_dict=join(best["folder"], "plans.json")
        if isfile(join(best["folder"], "plans.json")) else None,
        dataset_json_file_or_dict=join(best["folder"], "dataset.json")
        if isfile(join(best["folder"], "dataset.json")) else None,
        num_processes=num_processes, keep_postprocessed_files=True)

    info = {
        "folds": list(folds),
        "dataset_name_or_id": str(dataset_name_or_id),
        "considered_models": sorted(results),
        "ranking": {k: results[k]["mean_fg_dice"] for k in results},
        "best_model_or_ensemble": {
            "key": best_key,
            "source": best["source"],
            "spec": best["spec"],
            "result_folder": best["folder"],
            "mean_fg_dice": best["mean_fg_dice"],
            "postprocessing_file": join(best["folder"],
                                        "postprocessing.pkl"),
            "postprocessing_fns": [fn.__name__ for fn in pp_fns],
            "postprocessing_kwargs": pp_fn_kwargs,
        },
    }
    out_base = join(paths.get_results(), dataset_name)
    save_json(info, join(out_base, "inference_information.json"))
    with open(join(out_base, "inference_instructions.txt"), "w") as f:
        f.write("***Run inference like this:***\n\n")
        if best["source"] == "single":
            s = best["spec"]
            f.write(f"mvdseg_predict -d {dataset_name} -i INPUT -o OUTPUT "
                    f"-f {' '.join(map(str, folds))} "
                    f"-tr {s['trainer']} -c {s['configuration']} "
                    f"-p {s['plans']}\n")
        else:
            f.write("predict with each member model (--save_probabilities), "
                    "then:\nmvdseg_ensemble -i FOLDER1 FOLDER2 -o OUTPUT\n")
        f.write("\n***Once inference is completed, run postprocessing:***\n\n")
        f.write(f"mvdseg_apply_postprocessing -i OUTPUT -o OUTPUT_PP "
                f"-pp_pkl_file {info['best_model_or_ensemble']['postprocessing_file']}\n")
    return info


def accumulate_crossval_results_entry_point_api(dataset_name_or_id, trainer,
                                                plans, configuration,
                                                folds=(0, 1, 2, 3, 4),
                                                num_processes=default_num_processes):
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    folder = _model_folder(dataset_name, {"trainer": trainer, "plans": plans,
                                          "configuration": configuration})
    merged = join(folder,
                  f"crossval_results_folds_{folds_tuple_to_string(folds)}")
    accumulate_cv_results(folder, merged, folds, num_processes)
    return merged
