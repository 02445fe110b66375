"""Overlay PNG generation (image + colored segmentation).

Parity: reference nnunetv2/utilities/overlay_plots.py (274 LoC): pick the
slice with the most foreground, window the intensity image, alpha-blend a
color per label, save PNG; folder/dataset drivers with a process pool.
"""

import multiprocessing
from typing import List, Optional, Tuple

import numpy as np

from .. import paths
from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.files import join, load_json, maybe_mkdir_p, subfiles

# the reference's color cycle (matplotlib tab-like hex palette)
color_cycle = (
    "000000", "4363d8", "f58231", "3cb44b", "e6194B", "911eb4", "ffe119",
    "bfef45", "42d4f4", "f032e6", "000075", "9A6324", "808000", "800000",
    "469990",
)


def hex_to_rgb(h: str) -> Tuple[int, int, int]:
    return tuple(int(h[i:i + 2], 16) for i in (0, 2, 4))


def generate_overlay(image: np.ndarray, segmentation: np.ndarray,
                     mapping: Optional[dict] = None,
                     color_cycle: Tuple[str, ...] = color_cycle,
                     overlay_intensity: float = 0.6) -> np.ndarray:
    """2D image + 2D labelmap → uint8 RGB (reference overlay_plots.py:40-86)."""
    image = np.copy(image).astype(np.float64)
    segmentation = segmentation.astype(np.int64)
    if mapping is None:
        mapping = {v: i for i, v in
                   enumerate(sorted(np.unique(segmentation)))}
    image -= image.min()
    image /= max(image.max(), 1e-8)
    image *= 255
    rgb = np.stack([image] * 3, -1)
    for label, idx in mapping.items():
        if label == 0:
            continue
        color = hex_to_rgb(color_cycle[idx % len(color_cycle)])
        mask = segmentation == label
        rgb[mask] = (1 - overlay_intensity) * rgb[mask] + \
            overlay_intensity * np.array(color)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def select_slice(segmentation: np.ndarray) -> int:
    """The axial slice with the most foreground voxels (reference :89-97)."""
    fg = (segmentation > 0).sum(axis=tuple(range(1, segmentation.ndim)))
    return int(np.argmax(fg))


def plot_overlay(image_file: str, seg_file: str, image_reader_writer,
                 output_file: str, overlay_intensity: float = 0.6):
    """reference :100-128."""
    from PIL import Image
    img, _ = image_reader_writer.read_images([image_file])
    seg, _ = image_reader_writer.read_seg(seg_file)
    img = img[0]
    seg = seg[0]
    if img.ndim == 3:
        s = select_slice(seg)
        img, seg = img[s], seg[s]
    overlay = generate_overlay(img, seg,
                               overlay_intensity=overlay_intensity)
    Image.fromarray(overlay).save(output_file)


def generate_overlays_for_folder(image_folder: str, seg_folder: str,
                                 output_folder: str, dataset_json: dict,
                                 num_processes: int = 4,
                                 overlay_intensity: float = 0.6):
    rw = determine_reader_writer_from_dataset_json(dataset_json)()
    ending = dataset_json["file_ending"]
    maybe_mkdir_p(output_folder)
    segs = subfiles(seg_folder, suffix=ending, join=False)
    jobs = []
    for s in segs:
        case = s[: -len(ending)]
        img = join(image_folder, f"{case}_0000{ending}")
        jobs.append((img, join(seg_folder, s), rw,
                     join(output_folder, case + ".png"), overlay_intensity))
    if num_processes <= 1:
        for j in jobs:
            plot_overlay(*j)
    else:
        with multiprocessing.get_context("spawn").Pool(num_processes) as p:
            p.starmap(plot_overlay, jobs)


def generate_overlays_for_dataset(dataset_name_or_id, output_folder: str,
                                  num_processes: int = 4,
                                  overlay_intensity: float = 0.6):
    """reference entry_point_generate_overlay target."""
    name = maybe_convert_to_dataset_name(dataset_name_or_id)
    base = join(paths.get_raw(), name)
    dataset_json = load_json(join(base, "dataset.json"))
    generate_overlays_for_folder(join(base, "imagesTr"),
                                 join(base, "labelsTr"), output_folder,
                                 dataset_json, num_processes,
                                 overlay_intensity)
