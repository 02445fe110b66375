"""Raw-dataset file discovery helpers.

Parity: reference nnunetv2/utilities/utils.py:26-75 (identifier discovery via
the _XXXX channel-suffix convention, dataset.json 'dataset' key support)."""

import os
import re
from typing import List

import numpy as np

from .files import load_json, join, subfiles


def get_identifiers_from_splitted_dataset_folder(folder: str, file_ending: str
                                                 ) -> List[str]:
    files = subfiles(folder, suffix=file_ending, join=False)
    crop = len(file_ending) + 5  # strip _XXXX channel suffix + ending
    files = [i[:-crop] for i in files]
    return np.unique(files).tolist()


def create_lists_from_splitted_dataset_folder(folder: str, file_ending: str,
                                              identifiers: List[str] = None
                                              ) -> List[List[str]]:
    if identifiers is None:
        identifiers = get_identifiers_from_splitted_dataset_folder(folder, file_ending)
    files = subfiles(folder, suffix=file_ending, join=False, sort=True)
    list_of_lists = []
    for f in identifiers:
        p = re.compile(re.escape(f) + r"_\d\d\d\d" + re.escape(file_ending))
        list_of_lists.append([join(folder, i) for i in files if p.fullmatch(i)])
    return list_of_lists


def get_filenames_of_train_images_and_targets(raw_dataset_folder: str,
                                              dataset_json: dict = None) -> dict:
    if dataset_json is None:
        dataset_json = load_json(join(raw_dataset_folder, 'dataset.json'))

    if 'dataset' in dataset_json:
        dataset = dataset_json['dataset']
        for k in dataset:
            dataset[k]['label'] = (dataset[k]['label'] if os.path.isabs(dataset[k]['label'])
                                   else os.path.abspath(join(raw_dataset_folder, dataset[k]['label'])))
            dataset[k]['images'] = [i if os.path.isabs(i)
                                    else os.path.abspath(join(raw_dataset_folder, i))
                                    for i in dataset[k]['images']]
        return dataset

    identifiers = get_identifiers_from_splitted_dataset_folder(
        join(raw_dataset_folder, 'imagesTr'), dataset_json['file_ending'])
    images = create_lists_from_splitted_dataset_folder(
        join(raw_dataset_folder, 'imagesTr'), dataset_json['file_ending'], identifiers)
    segs = [join(raw_dataset_folder, 'labelsTr', i + dataset_json['file_ending'])
            for i in identifiers]
    return {i: {'images': im, 'label': se}
            for i, im, se in zip(identifiers, images, segs)}
