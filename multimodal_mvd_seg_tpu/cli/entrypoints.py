"""Console entry points.

Parity: the reference's 21 console_scripts (nnUNet/setup.py:36-59), one
function per script. Canonical command names are ``mvdseg_*``;
``nnUNetv2_*`` aliases are registered too so reference workflows run
unchanged (see pyproject.toml).
"""

import argparse
import multiprocessing

from ..configuration import default_num_processes


def _dataset_ids(values):
    return [int(v) if str(v).isdigit() else v for v in values]


# ------------------------------------------------------ plan & preprocess

def extract_fingerprint_entry():
    p = argparse.ArgumentParser()
    p.add_argument("-d", nargs="+", required=True, help="dataset ids")
    p.add_argument("-fpe", default="DatasetFingerprintExtractor")
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    p.add_argument("--clean", action="store_true")
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args()
    from ..experiment_planning.api import extract_fingerprints
    extract_fingerprints(_dataset_ids(a.d), a.np,
                         a.verify_dataset_integrity, a.clean, a.verbose)


def plan_experiment_entry():
    p = argparse.ArgumentParser()
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-pl", default="ExperimentPlanner")
    p.add_argument("-gpu_memory_target", type=float, default=8)
    p.add_argument("-preprocessor_name", default="DefaultPreprocessor")
    p.add_argument("-overwrite_target_spacing", nargs="+", type=float,
                   default=None)
    p.add_argument("-overwrite_plans_name", default=None)
    a = p.parse_args()
    from ..experiment_planning.api import plan_experiments
    plan_experiments(_dataset_ids(a.d), a.pl, a.gpu_memory_target,
                     a.preprocessor_name, a.overwrite_target_spacing,
                     a.overwrite_plans_name)


def preprocess_entry():
    p = argparse.ArgumentParser()
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-plans_name", default="nnUNetPlans")
    p.add_argument("-c", nargs="+", default=("2d", "3d_fullres", "3d_lowres"))
    p.add_argument("-np", type=int, nargs="+", default=None)
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args()
    from ..experiment_planning.api import preprocess
    np_ = a.np if a.np is not None else [default_num_processes] * len(a.c)
    preprocess(_dataset_ids(a.d), a.plans_name, configurations=a.c,
               num_processes=np_, verbose=a.verbose)


def plan_and_preprocess_entry():
    p = argparse.ArgumentParser()
    p.add_argument("-d", nargs="+", required=True)
    p.add_argument("-fpe", default="DatasetFingerprintExtractor")
    p.add_argument("-npfp", type=int, default=default_num_processes)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    p.add_argument("--no_pp", action="store_true",
                   help="only fingerprint + plan, no preprocessing")
    p.add_argument("--clean", action="store_true")
    p.add_argument("-pl", default="ExperimentPlanner")
    p.add_argument("-gpu_memory_target", type=float, default=8)
    p.add_argument("-preprocessor_name", default="DefaultPreprocessor")
    p.add_argument("-overwrite_target_spacing", nargs="+", type=float,
                   default=None)
    p.add_argument("-overwrite_plans_name", default=None)
    p.add_argument("-c", nargs="+", default=("2d", "3d_fullres", "3d_lowres"))
    p.add_argument("-np", type=int, nargs="+", default=None)
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args()
    from ..experiment_planning.api import (extract_fingerprints,
                                           plan_experiments, preprocess)
    ids = _dataset_ids(a.d)
    extract_fingerprints(ids, a.npfp, a.verify_dataset_integrity, a.clean,
                         a.verbose)
    plan_experiments(ids, a.pl, a.gpu_memory_target, a.preprocessor_name,
                     a.overwrite_target_spacing, a.overwrite_plans_name)
    if not a.no_pp:
        np_ = a.np if a.np is not None else [default_num_processes] * len(a.c)
        plans_name = a.overwrite_plans_name or "nnUNetPlans"
        preprocess(ids, plans_name, configurations=a.c, num_processes=np_,
                   verbose=a.verbose)


# ----------------------------------------------------------------- train

def run_training_entry():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_name_or_id")
    p.add_argument("configuration")
    p.add_argument("fold", help="0-4 or 'all'")
    p.add_argument("-tr", default="MVDSegTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-pretrained_weights", default=None)
    p.add_argument("-num_gpus", type=int, default=None,
                   help="number of devices for the data-parallel mesh")
    p.add_argument("--npz", action="store_true",
                   help="save softmax probabilities during final validation")
    p.add_argument("--c", action="store_true", help="continue training")
    p.add_argument("--val", action="store_true", help="validation only")
    p.add_argument("--val_best", action="store_true")
    p.add_argument("--disable_checkpointing", action="store_true")
    p.add_argument("-sp", "--specified_cfg", default=None,
                   help="output-folder suffix (the fork's -sp flag)")
    p.add_argument("-device", default="auto")
    p.add_argument("--multi_host", action="store_true",
                   help="initialize jax.distributed for a multi-host run "
                        "(launch the same command on every host; coordinator "
                        "from TPU pod metadata or JAX_COORDINATOR_ADDRESS/"
                        "JAX_NUM_PROCESSES/JAX_PROCESS_ID)")
    a = p.parse_args()
    from ..run.run_training import run_training
    run_training(a.dataset_name_or_id, a.configuration, a.fold, a.tr, a.p,
                 a.pretrained_weights, a.num_gpus, a.npz, a.c, a.val,
                 a.disable_checkpointing, a.val_best, a.specified_cfg,
                 a.device, multi_host=a.multi_host)


# --------------------------------------------------------------- predict

def predict_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("-i", required=True, help="input folder")
    p.add_argument("-o", required=True, help="output folder")
    p.add_argument("-d", required=True, help="dataset name or id")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-tr", default="MVDSegTrainer")
    p.add_argument("-c", required=True, help="configuration")
    p.add_argument("-f", nargs="+", default=(0, 1, 2, 3, 4))
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--continue_prediction", action="store_true")
    p.add_argument("-chk", default="checkpoint_final.pkl")
    p.add_argument("-npp", type=int, default=3)
    p.add_argument("-nps", type=int, default=3)
    p.add_argument("-prev_stage_predictions", default=None,
                   help="lowres predictions folder (cascade configurations)")
    p.add_argument("-device", default="auto")
    a = p.parse_args()
    from .. import paths
    from ..inference.predictor import MVDSegPredictor
    from ..utils.dataset_naming import maybe_convert_to_dataset_name
    from ..utils.files import join
    model_folder = join(paths.get_results(),
                        maybe_convert_to_dataset_name(a.d),
                        f"{a.tr}__{a.p}__{a.c}")
    predictor = MVDSegPredictor(tile_step_size=a.step_size,
                                use_mirroring=not a.disable_tta)
    predictor.initialize_from_trained_model_folder(
        model_folder, use_folds=tuple(a.f), checkpoint_name=a.chk)
    predictor.predict_from_files(
        a.i, a.o, save_probabilities=a.save_probabilities,
        overwrite=not a.continue_prediction,
        num_processes_preprocessing=a.npp,
        num_processes_segmentation_export=a.nps,
        folder_with_segs_from_prev_stage=a.prev_stage_predictions)


def predict_entry_point_modelfolder():
    p = argparse.ArgumentParser()
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-m", required=True, help="trained model folder")
    p.add_argument("-f", nargs="+", default=None)
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--continue_prediction", action="store_true")
    p.add_argument("-chk", default="checkpoint_final.pkl")
    a = p.parse_args()
    from ..inference.predictor import MVDSegPredictor
    predictor = MVDSegPredictor(tile_step_size=a.step_size,
                                use_mirroring=not a.disable_tta)
    predictor.initialize_from_trained_model_folder(
        a.m, use_folds=tuple(a.f) if a.f else None, checkpoint_name=a.chk)
    predictor.predict_from_files(
        a.i, a.o, save_probabilities=a.save_probabilities,
        overwrite=not a.continue_prediction)


# ------------------------------------------------------- selection chain

def find_best_configuration_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_name_or_id")
    p.add_argument("-p", nargs="+", default=("nnUNetPlans",))
    p.add_argument("-c", nargs="+",
                   default=("2d", "3d_fullres", "3d_lowres",
                            "3d_cascade_fullres"))
    p.add_argument("-tr", nargs="+", default=("MVDSegTrainer",))
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    p.add_argument("--disable_ensembling", action="store_true")
    p.add_argument("--no_overwrite", action="store_true")
    a = p.parse_args()
    from ..evaluation.find_best_configuration import (
        default_trained_models, find_best_configuration)
    models = default_trained_models(tuple(a.tr), tuple(a.p), tuple(a.c))
    find_best_configuration(a.dataset_name_or_id, models,
                            not a.disable_ensembling, a.np,
                            not a.no_overwrite, tuple(a.f))


def accumulate_crossval_results_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_name_or_id")
    p.add_argument("-c", required=True)
    p.add_argument("-tr", default="MVDSegTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    p.add_argument("-np", type=int, default=default_num_processes)
    a = p.parse_args()
    from ..evaluation.find_best_configuration import (
        accumulate_crossval_results_entry_point_api)
    accumulate_crossval_results_entry_point_api(
        a.dataset_name_or_id, a.tr, a.p, a.c, tuple(a.f), a.np)


def entry_point_determine_postprocessing_folder():
    p = argparse.ArgumentParser()
    p.add_argument("-i", required=True, help="prediction folder")
    p.add_argument("-ref", required=True, help="ground-truth folder")
    p.add_argument("-plans_json", default=None)
    p.add_argument("-dataset_json", default=None)
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("--remove_postprocessed", action="store_true")
    a = p.parse_args()
    from ..postprocessing.remove_connected_components import (
        determine_postprocessing)
    determine_postprocessing(a.i, a.ref, a.plans_json, a.dataset_json, a.np,
                             not a.remove_postprocessed)


def entry_point_apply_postprocessing():
    p = argparse.ArgumentParser()
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-pp_pkl_file", required=True)
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("-plans_json", default=None)
    p.add_argument("-dataset_json", default=None)
    a = p.parse_args()
    from ..postprocessing.remove_connected_components import (
        apply_postprocessing_to_folder)
    from ..utils.files import load_pickle
    pp_fns, pp_kwargs = load_pickle(a.pp_pkl_file)
    apply_postprocessing_to_folder(a.i, a.o, pp_fns, pp_kwargs, a.plans_json,
                                   a.dataset_json, a.np)


def entry_point_ensemble_folders():
    p = argparse.ArgumentParser()
    p.add_argument("-i", nargs="+", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("--save_npz", action="store_true")
    a = p.parse_args()
    from ..ensembling.ensemble import ensemble_folders
    ensemble_folders(a.i, a.o, a.save_npz, a.np)


# -------------------------------------------------------------- evaluate

def evaluate_folder_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-djfile", required=True, help="dataset.json")
    p.add_argument("-pfile", required=True, help="plans.json")
    p.add_argument("-o", default=None, help="output summary.json")
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("--chill", action="store_true")
    a = p.parse_args()
    from ..evaluation.evaluate import compute_metrics_on_folder
    from ..plans.plans_handler import PlansManager
    from ..utils.files import join, load_json
    dataset_json = load_json(a.djfile)
    pm = PlansManager(load_json(a.pfile))
    lm = pm.get_label_manager(dataset_json)
    labels = lm.foreground_regions if lm.has_regions else lm.foreground_labels
    out = a.o or join(a.pred_folder, "summary.json")
    compute_metrics_on_folder(a.gt_folder, a.pred_folder, out,
                              pm.image_reader_writer_class(),
                              dataset_json["file_ending"], labels,
                              lm.ignore_label, a.np, chill=a.chill)


def evaluate_simple_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-l", nargs="+", type=int, required=True, help="labels")
    p.add_argument("-il", type=int, default=None, help="ignore label")
    p.add_argument("-o", default=None)
    p.add_argument("-np", type=int, default=default_num_processes)
    a = p.parse_args()
    from ..evaluation.evaluate import compute_metrics_on_folder_simple
    from ..utils.files import load_json, join, save_json
    # infer reader/file ending from the folder content
    import os
    endings = {f[f.index("."):] for f in os.listdir(a.gt_folder)
               if "." in f}
    ending = ".nii.gz" if ".nii.gz" in "".join(endings) else endings.pop()
    labels = {"background": 0}
    labels.update({str(i): i for i in a.l if i != 0})
    dataset_json = {"labels": labels, "file_ending": ending}
    if a.il is not None:
        dataset_json["labels"]["ignore"] = a.il
    res = compute_metrics_on_folder_simple(a.gt_folder, a.pred_folder,
                                           dataset_json,
                                           num_processes=a.np)
    out = a.o or join(a.pred_folder, "summary.json")
    from ..evaluation.evaluate import _jsonify
    save_json(_jsonify(res), out)


# ------------------------------------------------------------- sharing &c

def export_pretrained_model_entry():
    p = argparse.ArgumentParser()
    p.add_argument("-d", required=True)
    p.add_argument("-o", required=True, help="output zip")
    p.add_argument("-c", nargs="+",
                   default=("2d", "3d_fullres", "3d_lowres",
                            "3d_cascade_fullres"))
    p.add_argument("-tr", default="MVDSegTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", default=(0, 1, 2, 3, 4))
    p.add_argument("-chk", nargs="+", default=("checkpoint_final.pkl",))
    p.add_argument("--not_strict", action="store_true")
    p.add_argument("--exp_cv_preds", action="store_true")
    a = p.parse_args()
    from ..model_sharing.model_export import export_pretrained_model
    export_pretrained_model(a.d, a.o, tuple(a.c), a.tr, a.p, tuple(a.f),
                            not a.not_strict, tuple(a.chk), a.exp_cv_preds)


def install_from_zip_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("zip_file")
    a = p.parse_args()
    from ..model_sharing.model_import import install_model_from_zip_file
    install_model_from_zip_file(a.zip_file)


def download_by_url():
    p = argparse.ArgumentParser()
    p.add_argument("url")
    a = p.parse_args()
    from ..model_sharing.model_download import download_and_install_from_url
    download_and_install_from_url(a.url)


def import_torch_checkpoint_entry():
    """Convert a reference-trained torch checkpoint (.pth) into a flax
    params pickle + net-kwargs JSON (model_sharing/torch_import.py).
    Detects the architecture: PlainConvUNet (nnU-Net) or the MVD
    ContrastiveNet (the reference's get_network_from_plans default)."""
    p = argparse.ArgumentParser(
        description="Import an nnU-Net/MVD torch checkpoint "
                    "(PlainConvUNet or ContrastiveNet, auto-detected); "
                    "writes <out>.pkl (flax params [+batch_stats]) and "
                    "<out>.json (the constructor kwargs).")
    p.add_argument("checkpoint", help="checkpoint_final.pth / .pt path")
    p.add_argument("out", help="output prefix")
    a = p.parse_args()
    import json
    import pickle

    from ..model_sharing.torch_import import (contrastive_net_kwargs,
                                              convert_contrastive_net,
                                              convert_plain_conv_unet,
                                              load_network_weights,
                                              plain_conv_unet_kwargs)
    w = load_network_weights(a.checkpoint)
    if any(k.startswith("share_encoder.") for k in w):
        kwargs = contrastive_net_kwargs(w)
        params, stats = convert_contrastive_net(w, kwargs["num_heads"])
        payload = {"params": params, "batch_stats": stats,
                   "net_kwargs": kwargs, "architecture": "ContrastiveNet"}
    else:
        kwargs = plain_conv_unet_kwargs(w)
        params = convert_plain_conv_unet(w)
        payload = {"params": params, "net_kwargs": kwargs,
                   "architecture": "PlainConvUNetCF"}
    with open(a.out + ".pkl", "wb") as f:
        pickle.dump(payload, f)
    with open(a.out + ".json", "w") as f:
        json.dump(kwargs, f, indent=2)
    import jax
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {payload['architecture']}: {n:,} parameters "
          f"-> {a.out}.pkl (+.json)")


def import_torch_model_folder_entry():
    """Convert a whole reference trained-model folder (plans.json +
    dataset.json + fold_*/checkpoint_*.pth) into this framework's
    results-folder format, directly runnable by mvdseg_predict."""
    p = argparse.ArgumentParser(
        description="Import a reference (nnU-Net v2 / MVD) trained-model "
                    "folder. <src> is the torch results folder "
                    "(…/DatasetXXX/nnUNetTrainer__nnUNetPlans__3d_fullres); "
                    "<dst> receives plans.json, dataset.json and converted "
                    "fold_*/checkpoint_*.pkl. Run mvdseg_predict with "
                    "-m <dst> afterwards.")
    p.add_argument("src", help="reference trained-model folder")
    p.add_argument("dst", help="output trained-model folder")
    p.add_argument("-chk", nargs="+", default=None,
                   help="checkpoint file names to convert (default: "
                        "checkpoint_final.pth + checkpoint_best.pth)")
    a = p.parse_args()
    from ..model_sharing.torch_import import import_torch_model_folder
    kw = {"checkpoint_names": tuple(a.chk)} if a.chk else {}
    converted = import_torch_model_folder(a.src, a.dst, **kw)
    for fold, files in sorted(converted.items()):
        for f in files:
            print(f"converted {fold}: {f}")


def entry_point_move_plans_between_datasets():
    p = argparse.ArgumentParser()
    p.add_argument("-s", required=True, help="source dataset")
    p.add_argument("-t", required=True, help="target dataset")
    p.add_argument("-sp", required=True, help="source plans identifier")
    p.add_argument("-tp", default=None, help="target plans identifier")
    a = p.parse_args()
    from ..experiment_planning.move_plans_between_datasets import (
        move_plans_between_datasets)
    move_plans_between_datasets(a.s, a.t, a.sp, a.tp)


def entry_point_generate_overlay():
    p = argparse.ArgumentParser()
    p.add_argument("-d", required=True, help="dataset name or id")
    p.add_argument("-o", required=True, help="output folder")
    p.add_argument("-np", type=int, default=default_num_processes)
    p.add_argument("-overlay_intensity", type=float, default=0.6)
    a = p.parse_args()
    from ..utils.overlay_plots import generate_overlays_for_dataset
    generate_overlays_for_dataset(a.d, a.o, a.np, a.overlay_intensity)


def convert_msd_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("-i", required=True, help="MSD TaskXX folder")
    p.add_argument("-overwrite_id", type=int, default=None)
    p.add_argument("-np", type=int, default=default_num_processes)
    a = p.parse_args()
    from ..dataset_conversion.convert_MSD_dataset import convert_msd_dataset
    convert_msd_dataset(a.i, a.overwrite_id, a.np)


def convert_old_nnunet_entry_point():
    p = argparse.ArgumentParser()
    p.add_argument("input_folder", help="old TaskXXX folder")
    a = p.parse_args()
    from ..dataset_conversion.convert_raw_dataset_from_old_nnunet_format \
        import convert_old_dataset
    convert_old_dataset(a.input_folder)


if __name__ == "__main__":
    raise SystemExit("use the installed mvdseg_* / nnUNetv2_* console "
                     "scripts (see pyproject.toml)")
