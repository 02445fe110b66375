"""Reader/writer registry.

Parity: reference nnunetv2/imageio/reader_writer_registry.py:14-76 — resolve IO
classes from dataset.json overrides, file endings, or by class name."""

import traceback
from typing import Type

from .base import BaseReaderWriter
from .natural import NaturalImage2DIO
from .nifti import NiftiIO, SimpleITKIO, NibabelIO, NibabelIOWithReorient
from .tiff import Tiff3DIO

LIST_OF_IO_CLASSES = [
    NaturalImage2DIO,
    NiftiIO,
    Tiff3DIO,
]

_BY_NAME = {cls.__name__: cls for cls in
            [NaturalImage2DIO, NiftiIO, SimpleITKIO, NibabelIO,
             NibabelIOWithReorient, Tiff3DIO]}


def register_reader_writer(cls: Type[BaseReaderWriter]):
    _BY_NAME[cls.__name__] = cls
    if cls not in LIST_OF_IO_CLASSES:
        LIST_OF_IO_CLASSES.append(cls)
    return cls


def find_reader_writer_by_name(rw_class_name: str) -> Type[BaseReaderWriter]:
    if rw_class_name in _BY_NAME:
        return _BY_NAME[rw_class_name]
    raise RuntimeError(f"Unknown reader/writer class {rw_class_name!r}. "
                       f"Known: {sorted(_BY_NAME)}")


def determine_reader_writer_from_dataset_json(
        dataset_json_content: dict, example_file: str = None,
        allow_nonmatching_filename: bool = False, verbose: bool = True
) -> Type[BaseReaderWriter]:
    ow = dataset_json_content.get("overwrite_image_reader_writer")
    if ow is not None and ow != "None":
        try:
            ret = find_reader_writer_by_name(ow)
            if verbose:
                print(f"Using {ret} reader/writer")
            return ret
        except RuntimeError:
            if verbose:
                print(f"Warning: unknown ioclass in dataset.json: {ow}; "
                      f"determining automatically")
    return determine_reader_writer_from_file_ending(
        dataset_json_content["file_ending"], example_file,
        allow_nonmatching_filename, verbose)


def determine_reader_writer_from_file_ending(
        file_ending: str, example_file: str = None,
        allow_nonmatching_filename: bool = False, verbose: bool = True
) -> Type[BaseReaderWriter]:
    for rw in LIST_OF_IO_CLASSES:
        matches = any(file_ending.lower().endswith(e) or e.endswith(file_ending.lower())
                      for e in rw.supported_file_endings) \
            or file_ending.lower() in rw.supported_file_endings
        if matches or (allow_nonmatching_filename and example_file is not None):
            if example_file is not None:
                try:
                    rw().read_images((example_file,))
                except Exception:
                    if verbose:
                        print(f"Failed to open {example_file} with {rw}:")
                        traceback.print_exc()
                    continue
            if verbose:
                print(f"Using {rw} as reader/writer")
            return rw
    raise RuntimeError(f"Unable to determine a reader for file ending "
                       f"{file_ending} and file {example_file}")
