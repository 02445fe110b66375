"""Dataset/results folder resolution from environment variables.

Parity: reference nnunetv2/paths.py:21-39 (env vars nnUNet_raw,
nnUNet_preprocessed, nnUNet_results). We accept the new MVDSEG_* names first and
fall back to the legacy nnUNet_* names so users of the reference can switch
without re-exporting their environment."""

import os


def _resolve(new: str, legacy: str):
    return os.environ.get(new) or os.environ.get(legacy)


mvdseg_raw = _resolve("MVDSEG_raw", "nnUNet_raw")
mvdseg_preprocessed = _resolve("MVDSEG_preprocessed", "nnUNet_preprocessed")
mvdseg_results = _resolve("MVDSEG_results", "nnUNet_results")

# legacy aliases used throughout (mirrors the reference's module globals)
nnUNet_raw = mvdseg_raw
nnUNet_preprocessed = mvdseg_preprocessed
nnUNet_results = mvdseg_results


def refresh():
    """Re-read the environment (tests mutate os.environ after import)."""
    global mvdseg_raw, mvdseg_preprocessed, mvdseg_results
    global nnUNet_raw, nnUNet_preprocessed, nnUNet_results
    mvdseg_raw = nnUNet_raw = _resolve("MVDSEG_raw", "nnUNet_raw")
    mvdseg_preprocessed = nnUNet_preprocessed = _resolve(
        "MVDSEG_preprocessed", "nnUNet_preprocessed")
    mvdseg_results = nnUNet_results = _resolve("MVDSEG_results", "nnUNet_results")


def get_raw(required: bool = True):
    refresh()
    if required and mvdseg_raw is None:
        raise RuntimeError(
            "MVDSEG_raw (or legacy nnUNet_raw) is not set. Point it at your raw "
            "dataset folder.")
    return mvdseg_raw


def get_preprocessed(required: bool = True):
    refresh()
    if required and mvdseg_preprocessed is None:
        raise RuntimeError(
            "MVDSEG_preprocessed (or legacy nnUNet_preprocessed) is not set.")
    return mvdseg_preprocessed


def get_results(required: bool = True):
    refresh()
    if required and mvdseg_results is None:
        raise RuntimeError(
            "MVDSEG_results (or legacy nnUNet_results) is not set.")
    return mvdseg_results
