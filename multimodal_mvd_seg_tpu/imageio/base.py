"""Reader/writer contract.

Parity: reference nnunetv2/imageio/base_reader_writer.py:21-120. Images are
returned as 4D float arrays (c, x, y, z) plus a properties dict that MUST carry
``{'spacing': (a, b, c)}`` matching the spatial axes; 2D data uses a leading
singleton spatial axis with spacing 999. Segmentations are (1, x, y, z)."""

from abc import ABC, abstractmethod
from typing import List, Tuple, Union

import numpy as np


class BaseReaderWriter(ABC):
    supported_file_endings: List[str] = []

    @staticmethod
    def _check_all_same(input_list) -> bool:
        for i in input_list[1:]:
            if len(i) != len(input_list[0]) or any(
                    a != b for a, b in zip(i, input_list[0])):
                return False
        return True

    @staticmethod
    def _check_all_same_array(input_list) -> bool:
        for i in input_list[1:]:
            if i.shape != input_list[0].shape or not np.allclose(i, input_list[0]):
                return False
        return True

    @abstractmethod
    def read_images(self, image_fnames: Union[List[str], Tuple[str, ...]]
                    ) -> Tuple[np.ndarray, dict]:
        ...

    @abstractmethod
    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        ...

    @abstractmethod
    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        ...
