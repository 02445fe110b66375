"""3D TIFF IO with a .json spacing sidecar.

Parity: reference nnunetv2/imageio/tif_reader_writer.py. Implemented via PIL's
multi-frame TIFF support (tifffile is not available in this environment); the
spacing sidecar convention (``{case}.json`` next to the image with a
``{'spacing': [a,b,c]}`` payload) matches the reference."""

import os
from typing import List, Tuple, Union

import numpy as np

from .base import BaseReaderWriter
from ..utils.files import load_json, save_json


def _read_tiff_stack(fname: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(fname)
    frames = []
    i = 0
    while True:
        try:
            img.seek(i)
        except EOFError:
            break
        frames.append(np.asarray(img))
        i += 1
    return np.stack(frames, 0) if len(frames) > 1 else frames[0][None]


class Tiff3DIO(BaseReaderWriter):
    supported_file_endings = [".tif", ".tiff"]

    def read_images(self, image_fnames: Union[List[str], Tuple[str, ...]]
                    ) -> Tuple[np.ndarray, dict]:
        images, spacings = [], []
        for f in image_fnames:
            npy = _read_tiff_stack(f)
            assert npy.ndim == 3, f"{f}: only 3d tiffs supported"
            images.append(npy[None].astype(np.float32))
            ending_len = 4 if f.endswith(".tif") else 5
            sidecar = f[:-ending_len] + ".json"
            if os.path.isfile(sidecar):
                spacings.append(tuple(load_json(sidecar)["spacing"]))
            else:
                spacings.append((1.0, 1.0, 1.0))
        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Image shapes disagree: {image_fnames}")
        if not self._check_all_same(spacings):
            raise RuntimeError(f"Spacings disagree: {image_fnames}")
        return np.vstack(images), {"spacing": list(spacings[0])}

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images((seg_fname,))

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        from PIL import Image
        frames = [Image.fromarray(s.astype(np.uint8)) for s in seg]
        frames[0].save(output_fname, save_all=True, append_images=frames[1:])
        ending_len = 4 if output_fname.endswith(".tif") else 5
        save_json({"spacing": properties["spacing"]},
                  output_fname[:-ending_len] + ".json")
