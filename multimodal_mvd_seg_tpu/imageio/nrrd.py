"""Dependency-free NRRD reader (.nrrd / .nhdr).

Parity: the reference uses pynrrd in its in-house data-wrangling scripts
(nnunetv2/utilities/check_nrrd.py reads vessel NRRDs and compares label sets)
— that library is unavailable here, and like the NIfTI case the format is a
simple text header + raw/gzip voxel block, so we codec it directly.
Read-only: training/inference IO stays NIfTI (same as the reference, whose
converters turn NRRD into .nii.gz before nnU-Net sees it)."""

import gzip
import zlib
from typing import Tuple

import numpy as np

_NRRD_TYPES = {
    "signed char": np.int8, "int8": np.int8, "int8_t": np.int8,
    "uchar": np.uint8, "unsigned char": np.uint8, "uint8": np.uint8,
    "uint8_t": np.uint8,
    "short": np.int16, "short int": np.int16, "signed short": np.int16,
    "int16": np.int16, "int16_t": np.int16,
    "ushort": np.uint16, "unsigned short": np.uint16, "uint16": np.uint16,
    "uint16_t": np.uint16,
    "int": np.int32, "signed int": np.int32, "int32": np.int32,
    "int32_t": np.int32,
    "uint": np.uint32, "unsigned int": np.uint32, "uint32": np.uint32,
    "uint32_t": np.uint32,
    "longlong": np.int64, "long long": np.int64, "int64": np.int64,
    "int64_t": np.int64,
    "ulonglong": np.uint64, "uint64": np.uint64, "uint64_t": np.uint64,
    "float": np.float32, "double": np.float64,
}


def _parse_vector(s: str):
    s = s.strip()
    if s == "none":
        return None
    return [float(x) for x in s.strip("()").split(",")]


def read_nrrd(fname: str) -> Tuple[np.ndarray, dict]:
    """Returns (data in on-disk index order (fastest axis first, like the
    NRRD 'sizes' field), header dict with 'spacing' (per-axis, same order),
    'space_directions', 'space_origin')."""
    with open(fname, "rb") as f:
        raw = f.read()
    magic_end = raw.index(b"\n")
    magic = raw[:magic_end].decode("ascii", "replace")
    if not magic.startswith("NRRD"):
        raise ValueError(f"{fname}: not a NRRD file (magic {magic!r})")
    # header = lines until the first blank line
    header_end = raw.index(b"\n\n") if b"\n\n" in raw else len(raw)
    fields = {}
    for line in raw[magic_end + 1:header_end].decode(
            "ascii", "replace").splitlines():
        if line.startswith("#") or ":" not in line:
            continue
        key, _, val = line.partition(":")
        fields[key.strip().lower()] = val.lstrip("=").strip()

    if "data file" in fields or "datafile" in fields:
        raise ValueError(f"{fname}: detached-data NRRD (.nhdr) with "
                         f"external payload is not supported")
    sizes = [int(x) for x in fields["sizes"].split()]
    dtype = _NRRD_TYPES.get(fields["type"].strip())
    if dtype is None:
        raise ValueError(f"{fname}: unsupported NRRD type {fields['type']!r}")
    dtype = np.dtype(dtype)
    if dtype.itemsize > 1:
        endian = fields.get("endian", "little")
        dtype = dtype.newbyteorder("<" if endian == "little" else ">")

    payload = raw[header_end + 2:]
    encoding = fields.get("encoding", "raw").lower()
    if encoding in ("gzip", "gz"):
        payload = gzip.decompress(payload)
    elif encoding in ("zlib",):
        payload = zlib.decompress(payload)
    elif encoding in ("raw",):
        pass
    elif encoding not in ("txt", "text", "ascii"):
        raise ValueError(f"{fname}: unsupported NRRD encoding {encoding!r}")

    if encoding in ("txt", "text", "ascii"):
        data = np.array(payload.split(), dtype=dtype)
    else:
        count = int(np.prod(sizes))
        data = np.frombuffer(payload, dtype=dtype, count=count)
    # NRRD stores fastest axis first; C-order reshape needs reversed sizes
    # (ascii shares the full header build below — spacing/sizes included,
    # so nrrd_to_nifti works regardless of encoding)
    data = data.reshape(list(reversed(sizes))).T

    directions = None
    spacing = None
    if "space directions" in fields:
        vecs = [_parse_vector(v) for v in fields["space directions"].split()]
        directions = [v for v in vecs if v is not None]
        spacing = [float(np.linalg.norm(v)) for v in directions]
    elif "spacings" in fields:
        spacing = [float(x) for x in fields["spacings"].split()]
    header = {
        "sizes": sizes,
        "spacing": spacing,
        "space_directions": directions,
        "space_origin": _parse_vector(fields["space origin"])
        if "space origin" in fields else None,
        "fields": fields,
    }
    return data, header


def nrrd_to_nifti(nrrd_file: str, nifti_file: str):
    """Convert an NRRD volume to NIfTI-1 (the reference's wrangling scripts
    shell out to SimpleITK for this; training IO is NIfTI either way)."""
    from .nifti import write_nifti
    data, header = read_nrrd(nrrd_file)
    spacing = header["spacing"] or [1.0] * data.ndim
    write_nifti(nifti_file, data, spacing=tuple(spacing[:3]))
