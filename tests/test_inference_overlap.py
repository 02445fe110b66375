"""predict_from_files pipeline overlap: preprocessing and export must run
concurrently with device compute (VERDICT.md round-1 item 6 — the round-1
loop was strictly sequential and ignored its worker-count arguments)."""

import time

import numpy as np
import pytest


def test_predict_from_files_overlaps_pipeline(tmp_path, monkeypatch):
    from multimodal_mvd_seg_tpu.inference import predictor as pred_mod
    from multimodal_mvd_seg_tpu.inference import export as export_mod

    DELAY = 0.15
    n_cases = 4
    log = []

    def fake_run_case(self, files, seg_prev, pm, cm, dj):
        log.append(("prep", files[0], time.monotonic()))
        time.sleep(DELAY)  # stands in for host resampling
        return (np.zeros((1, 4, 4, 4), np.float32), None,
                {"case": files[0]})

    def fake_export(logits, properties, cm, pm, dj, out_file, **kw):
        log.append(("export", out_file, time.monotonic()))
        time.sleep(DELAY)  # stands in for resample-back + NIfTI write
        with open(out_file, "w") as f:
            f.write("seg")

    from multimodal_mvd_seg_tpu.preprocessing.preprocessor import (
        DefaultPreprocessor)
    monkeypatch.setattr(DefaultPreprocessor, "run_case", fake_run_case)
    monkeypatch.setattr(export_mod, "export_prediction_from_logits",
                        fake_export)

    p = pred_mod.MVDSegPredictor(verbose=False)
    p.dataset_json = {"file_ending": ".nii.gz"}

    def fake_predict(data):
        time.sleep(DELAY)  # stands in for device compute
        return np.zeros((3, 4, 4, 4), np.float32)

    p.predict_preprocessed_case = fake_predict

    lists = [[str(tmp_path / f"case_{i}_0000.nii.gz")] for i in range(n_cases)]
    outs = [str(tmp_path / f"out_{i}") for i in range(n_cases)]

    t0 = time.monotonic()
    results = p.predict_from_files(lists, outs,
                                   num_processes_preprocessing=2,
                                   num_processes_segmentation_export=2)
    elapsed = time.monotonic() - t0

    assert len(results) == n_cases
    for r in results:
        assert r.endswith(".nii.gz")
        with open(r) as f:
            assert f.read() == "seg"
    serial = n_cases * 3 * DELAY
    # overlapped: compute is the critical path (n*DELAY) plus one prep lead-in
    # and one export tail — anything close to serial means no overlap
    assert elapsed < serial * 0.70, \
        f"no pipeline overlap: {elapsed:.2f}s vs serial {serial:.2f}s"
    # preprocessing of case 2+ must have STARTED before the previous
    # case finished exporting (true concurrency, not just reordering)
    prep_times = sorted(t for kind, _, t in log if kind == "prep")
    export_times = sorted(t for kind, _, t in log if kind == "export")
    assert prep_times[2] < export_times[0], \
        "later preprocessing did not overlap earlier compute/export"


def test_predict_from_files_sequential_workers_still_work(tmp_path,
                                                          monkeypatch):
    """num_processes=1 must behave identically (bounded prefetch of 2)."""
    from multimodal_mvd_seg_tpu.inference import predictor as pred_mod
    from multimodal_mvd_seg_tpu.inference import export as export_mod
    from multimodal_mvd_seg_tpu.preprocessing.preprocessor import (
        DefaultPreprocessor)

    monkeypatch.setattr(
        DefaultPreprocessor, "run_case",
        lambda self, files, sp, pm, cm, dj: (
            np.zeros((1, 2, 2, 2), np.float32), None, {}))

    written = []
    monkeypatch.setattr(
        export_mod, "export_prediction_from_logits",
        lambda logits, properties, cm, pm, dj, out_file, **kw:
        written.append(out_file))

    p = pred_mod.MVDSegPredictor(verbose=False)
    p.dataset_json = {"file_ending": ".nii.gz"}
    p.predict_preprocessed_case = \
        lambda data: np.zeros((3, 2, 2, 2), np.float32)
    lists = [[str(tmp_path / f"c{i}_0000.nii.gz")] for i in range(3)]
    outs = [str(tmp_path / f"o{i}") for i in range(3)]
    results = p.predict_from_files(lists, outs,
                                   num_processes_preprocessing=1,
                                   num_processes_segmentation_export=1)
    assert [r.split("/")[-1] for r in results] == \
           ["o0.nii.gz", "o1.nii.gz", "o2.nii.gz"]
    assert sorted(written) == sorted(results)
