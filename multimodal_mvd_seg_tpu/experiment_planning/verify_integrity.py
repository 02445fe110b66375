"""Raw-dataset integrity verification.

Parity: reference nnunetv2/experiment_planning/verify_dataset_integrity.py —
checks dataset.json ↔ files correspondence, per-case shape/spacing agreement
between modalities and label, and that labels contain only declared values."""

from typing import Union

import numpy as np

from .. import paths
from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..plans.label_handling import LabelManager
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.dataset_files import get_filenames_of_train_images_and_targets
from ..utils.files import load_json, join, isfile


def verify_dataset_integrity(dataset_name_or_id: Union[str, int],
                             num_processes: int = 8) -> None:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    folder = join(paths.get_raw(), dataset_name)
    dataset_json = load_json(join(folder, 'dataset.json'))

    assert 'file_ending' in dataset_json, "dataset.json must declare file_ending"
    assert 'labels' in dataset_json, "dataset.json must declare labels"
    assert ('channel_names' in dataset_json or 'modality' in dataset_json), \
        "dataset.json must declare channel_names"

    dataset = get_filenames_of_train_images_and_targets(folder, dataset_json)
    assert len(dataset) == dataset_json['numTraining'], (
        f"numTraining ({dataset_json['numTraining']}) does not match the number "
        f"of discovered cases ({len(dataset)})")

    num_channels = len(dataset_json.get('channel_names',
                                        dataset_json.get('modality')))
    label_manager = LabelManager(dataset_json['labels'],
                                 dataset_json.get('regions_class_order'))
    allowed = set(label_manager.all_labels)
    if label_manager.has_ignore_label:
        allowed.add(label_manager.ignore_label)

    rw_class = determine_reader_writer_from_dataset_json(
        dataset_json, dataset[next(iter(dataset))]['images'][0], verbose=False)
    rw = rw_class()

    for case, entry in dataset.items():
        for f in entry['images'] + [entry['label']]:
            assert isfile(f), f"{case}: missing file {f}"
        assert len(entry['images']) == num_channels, (
            f"{case}: expected {num_channels} image channels, found "
            f"{len(entry['images'])}")
        images, iprops = rw.read_images(entry['images'])
        seg, sprops = rw.read_seg(entry['label'])
        assert images.shape[1:] == seg.shape[1:], (
            f"{case}: image shape {images.shape[1:]} != seg shape {seg.shape[1:]}")
        assert np.allclose(iprops['spacing'], sprops['spacing']), (
            f"{case}: image spacing {iprops['spacing']} != seg spacing "
            f"{sprops['spacing']}")
        found = set(np.unique(seg).astype(int).tolist())
        unexpected = found - allowed
        assert not unexpected, (
            f"{case}: segmentation contains undeclared labels {sorted(unexpected)}; "
            f"declared: {sorted(allowed)}")
    print(f"Dataset {dataset_name}: integrity OK ({len(dataset)} cases)")
