"""Dice-parity convergence experiment (the accuracy-evidence protocol).

Trains the base 3d_fullres trainer AND the MVD ContrastiveTrainer to
convergence on a synthetic multimodal vessel dataset under the reference
training protocol (SGD lr 1e-2 nesterov, PolyLR, 250 it/epoch, full DA —
reference MVDTrainer.py:161-166/482-486), runs the real validation
(sliding-window predict → export → compute_metrics_on_folder →
summary.json, reference evaluate_predictions.py:123-180), and adds the
paper's topology metrics (clDice, Betti error) on the vessel class for the
MVD run.

The dataset is constructed so the MVD terms have signal to exploit:
- channel 0 ("T2"): shows the organ blob clearly, vessels faintly;
- channel 1 ("TOF"): shows vessels clearly (like TOF angiography), organ
  faintly — so mutual distillation between the T2/TOF branch predictions
  is informative;
- vessels are thin connected TUBES (random-walk centerlines): topology
  (one connected component, no spurious voids) is a meaningful prior.

Usage:
  python -m multimodal_mvd_seg_tpu.batch_running.dice_parity_experiment \
      --epochs 50 --cases 24 --out /tmp/parity [--trainer base|mvd|both]

Writes RESULTS.json with the per-trainer mean Dice (+clDice/Betti for the
vessel class) and paths to the summary.json files.
"""

import argparse
import json
import os

import numpy as np


def make_vessel_dataset(raw_dir: str, dataset_name: str = "Dataset031_Parity",
                        n_cases: int = 24, shape=(64, 96, 96), seed: int = 0):
    from ..imageio.nifti import write_nifti
    from ..experiment_planning.generate_dataset_json import (
        generate_dataset_json)

    ds = os.path.join(raw_dir, dataset_name)
    os.makedirs(os.path.join(ds, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(ds, "labelsTr"), exist_ok=True)
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.mgrid[[slice(0, s) for s in shape]]

    for i in range(n_cases):
        seg = np.zeros(shape, np.uint8)
        # organ: one ellipsoidal blob
        c = [rng.uniform(0.35, 0.65) * s for s in shape]
        ax = [rng.uniform(0.12, 0.2) * s for s in shape]
        organ = (((zz - c[0]) / ax[0]) ** 2 + ((yy - c[1]) / ax[1]) ** 2 +
                 ((xx - c[2]) / ax[2]) ** 2) < 1.0
        seg[organ] = 1
        # vessels: 2 random-walk tubes of radius ~1.5-2.5
        vessel = np.zeros(shape, bool)
        for _ in range(2):
            pos = np.array([rng.uniform(0.2, 0.8) * s for s in shape])
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction)
            radius = rng.uniform(1.5, 2.5)
            for _step in range(160):
                direction += rng.normal(scale=0.25, size=3)
                direction /= np.linalg.norm(direction)
                pos = pos + direction * 1.5
                pos = np.clip(pos, 2, np.array(shape) - 3)
                d2 = ((zz - pos[0]) ** 2 + (yy - pos[1]) ** 2 +
                      (xx - pos[2]) ** 2)
                vessel |= d2 < radius ** 2
        seg[vessel] = 2

        case = f"case_{i:03d}"
        base = rng.normal(0, 0.35, shape)
        smooth = rng.normal(0, 0.15, shape)
        # T2: organ bright, vessel faint; TOF: vessel bright, organ faint
        img0 = base + (seg == 1) * 1.2 + (seg == 2) * 0.25 + smooth
        img1 = base * 0.8 + rng.normal(0, 0.3, shape) + \
            (seg == 1) * 0.2 + (seg == 2) * 1.4
        for ch, img in enumerate((img0, img1)):
            img = img.astype(np.float32)
            img[:2] = 0
            img[-2:] = 0
            write_nifti(os.path.join(ds, "imagesTr",
                                     f"{case}_{ch:04d}.nii.gz"),
                        img.T, spacing=(1.0, 1.0, 1.0))
        write_nifti(os.path.join(ds, "labelsTr", f"{case}.nii.gz"),
                    seg.T, spacing=(1.0, 1.0, 1.0))
    generate_dataset_json(ds, channel_names={0: "T2", 1: "TOF"},
                          labels={"background": 0, "organ": 1, "vessel": 2},
                          num_training_cases=n_cases, file_ending=".nii.gz",
                          dataset_name=dataset_name)
    return ds


def vessel_topology_metrics(pred_folder: str, gt_folder: str,
                            vessel_label: int = 2):
    """clDice + Betti-number error on the vessel class, averaged over cases
    (reference clDice_metric.py / cal_betti.py protocol)."""
    from ..imageio.nifti import read_nifti
    from ..metrics.topology_metrics import clDice
    from ..ops.persistence import betti_numbers
    from ..utils.files import subfiles
    cl, betti_err, n = [], [], 0
    for f in subfiles(pred_folder, suffix=".nii.gz", join=False):
        gt_file = os.path.join(gt_folder, f)
        if not os.path.isfile(gt_file):
            continue
        pred = read_nifti(os.path.join(pred_folder, f))[0].T == vessel_label
        gt = read_nifti(gt_file)[0].T == vessel_label
        if gt.sum() == 0:
            continue
        cl.append(clDice(pred, gt))
        bp = betti_numbers(pred.astype(np.float32), 0.5)
        bg = betti_numbers(gt.astype(np.float32), 0.5)
        betti_err.append(float(np.abs(np.asarray(bp) -
                                      np.asarray(bg)).sum()))
        n += 1
    return {"clDice": float(np.mean(cl)) if cl else None,
            "betti_error": float(np.mean(betti_err)) if betti_err else None,
            "n_cases": n}


def run(epochs: int = 50, cases: int = 24, out_dir: str = "/tmp/parity",
        which: str = "both", iterations_per_epoch: int = 250,
        dataset_id: int = 31):
    raw = os.path.join(out_dir, "raw")
    pre = os.path.join(out_dir, "preprocessed")
    res = os.path.join(out_dir, "results")
    for d in (raw, pre, res):
        os.makedirs(d, exist_ok=True)
    os.environ["MVDSEG_raw"] = raw
    os.environ["MVDSEG_preprocessed"] = pre
    os.environ["MVDSEG_results"] = res
    from .. import paths
    paths.refresh()

    ds = make_vessel_dataset(raw, n_cases=cases)
    dataset_name = os.path.basename(ds)

    from ..experiment_planning.api import (extract_fingerprints,
                                           plan_experiments, preprocess)
    if not os.path.isfile(os.path.join(pre, dataset_name,
                                       "nnUNetPlans.json")):
        extract_fingerprints([dataset_id], num_processes=1,
                             check_dataset_integrity=True)
        plan_experiments([dataset_id])
        preprocess([dataset_id], configurations=("3d_fullres",),
                   num_processes=(1,))

    from ..run.run_training import get_trainer_from_args
    results = {}
    trainers = {"base": "MVDSegTrainer", "mvd": "ContrastiveTrainer"}
    if which != "both":
        trainers = {which: trainers[which]}
    for tag, trainer_name in trainers.items():
        trainer = get_trainer_from_args(dataset_id, "3d_fullres", 0,
                                        trainer_name)
        trainer.num_epochs = epochs
        trainer.num_iterations_per_epoch = iterations_per_epoch
        if hasattr(trainer, "memory_start_epoch"):
            # keep the reference curriculum's 50/200 and 100/200 fractions
            # when the budget is shorter than the reference's 200 epochs
            trainer.memory_start_epoch = epochs // 4
            trainer.contrastive_start_epoch = epochs // 2
        # auto-resume (the reference's --c): a dropped tunnel/host restart
        # continues from checkpoint_latest instead of starting over
        latest = os.path.join(trainer.output_folder, "checkpoint_latest.pkl")
        final = os.path.join(trainer.output_folder, "checkpoint_final.pkl")
        if os.path.isfile(final):
            trainer.initialize()
            trainer.load_checkpoint(final)
            print(f"[{tag}] training already complete; validating",
                  flush=True)
        elif os.path.isfile(latest):
            trainer.initialize()
            trainer.load_checkpoint(latest)
            print(f"[{tag}] resuming from epoch {trainer.current_epoch}",
                  flush=True)
        if not os.path.isfile(final):
            trainer.run_training()
        summary = trainer.perform_actual_validation()
        val_folder = os.path.join(trainer.output_folder, "validation")
        entry = {
            "trainer": trainer_name,
            "epochs": epochs,
            "mean_dice": summary["foreground_mean"]["Dice"],
            "dice_per_class": {str(k): v["Dice"]
                               for k, v in summary["mean"].items()},
            "summary_json": os.path.join(val_folder, "summary.json"),
        }
        try:
            entry["topology"] = vessel_topology_metrics(
                val_folder, os.path.join(ds, "labelsTr"))
        except Exception as e:  # never lose a finished training run
            entry["topology"] = {"error": repr(e)}
        results[tag] = entry
        with open(os.path.join(out_dir, "RESULTS.json"), "w") as f:
            json.dump(results, f, indent=2)
        print(f"[{tag}] {json.dumps(entry, indent=2)}", flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--cases", type=int, default=24)
    p.add_argument("--iters", type=int, default=250)
    p.add_argument("--out", default="/tmp/parity")
    p.add_argument("--trainer", default="both",
                   choices=("base", "mvd", "both"))
    a = p.parse_args()
    run(a.epochs, a.cases, a.out, a.trainer, a.iters)


if __name__ == "__main__":
    main()
