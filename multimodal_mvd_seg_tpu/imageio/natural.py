"""2D natural-image IO (png/bmp/jpg) via PIL.

Parity: reference nnunetv2/imageio/natural_image_reager_writer.py — images come
back as (c, 1, x, y) with spacing (999, 1, 1)."""

from typing import List, Tuple, Union

import numpy as np

from .base import BaseReaderWriter


class NaturalImage2DIO(BaseReaderWriter):
    supported_file_endings = [".png", ".bmp", ".tif", ".jpg", ".jpeg"]

    def read_images(self, image_fnames: Union[List[str], Tuple[str, ...]]
                    ) -> Tuple[np.ndarray, dict]:
        from PIL import Image
        images = []
        for f in image_fnames:
            npy = np.asarray(Image.open(f))
            if npy.ndim == 3:
                npy = npy.transpose((2, 0, 1))  # (c, x, y)
            elif npy.ndim == 2:
                npy = npy[None]
            images.append(npy[:, None].astype(np.float32))  # (c, 1, x, y)
        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Image shapes disagree: {image_fnames}")
        return np.vstack(images), {"spacing": (999, 1, 1)}

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images((seg_fname,))

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        from PIL import Image
        seg = np.asarray(seg)
        while seg.ndim > 2:  # (c, 1, x, y) / (1, x, y) → (x, y)
            seg = seg[0]
        Image.fromarray(seg.astype(np.uint8)).save(output_fname)
