"""dataset.json writer.

Reconstruction of the reference's missing module
``nnunetv2.dataset_conversion.generate_dataset_json`` (imported by 6 conversion
scripts, see SURVEY.md §0) from upstream nnU-Net v2.1.1 call-site semantics."""

from typing import Tuple

from ..utils.files import save_json, join


def generate_dataset_json(output_folder: str,
                          channel_names: dict,
                          labels: dict,
                          num_training_cases: int,
                          file_ending: str,
                          regions_class_order: Tuple[int, ...] = None,
                          dataset_name: str = None,
                          reference: str = None,
                          release: str = None,
                          license: str = None,
                          description: str = None,
                          overwrite_image_reader_writer: str = None,
                          **kwargs):
    """Write ``dataset.json`` into output_folder.

    channel_names: {0: 'T2', 1: 'TOF', ...} — keys are channel indices.
    labels: {'background': 0, 'vessel': 2, ...}; region-based labels map a name
    to a tuple of label ids and then require regions_class_order.
    """
    has_regions = any(isinstance(i, (tuple, list)) and len(i) > 1
                      for i in labels.values())
    if has_regions:
        assert regions_class_order is not None, \
            "region-based labels require regions_class_order"
    # channel names keys must be strings for json
    channel_names = {str(k): v for k, v in channel_names.items()}
    # label values must be ints (or lists of ints for regions)
    cleaned_labels = {}
    for k, v in labels.items():
        if isinstance(v, (tuple, list)):
            cleaned_labels[k] = [int(i) for i in v]
        else:
            cleaned_labels[k] = int(v)

    dataset_json = {
        'channel_names': channel_names,
        'labels': cleaned_labels,
        'numTraining': num_training_cases,
        'file_ending': file_ending,
    }
    if dataset_name is not None:
        dataset_json['name'] = dataset_name
    if reference is not None:
        dataset_json['reference'] = reference
    if release is not None:
        dataset_json['release'] = release
    if license is not None:
        dataset_json['licence'] = license
    if description is not None:
        dataset_json['description'] = description
    if overwrite_image_reader_writer is not None:
        dataset_json['overwrite_image_reader_writer'] = overwrite_image_reader_writer
    if regions_class_order is not None:
        dataset_json['regions_class_order'] = list(regions_class_order)
    dataset_json.update(kwargs)

    save_json(dataset_json, join(output_folder, 'dataset.json'), sort_keys=False)
    return dataset_json
