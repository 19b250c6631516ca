"""Format-dispatching volume read/write.

NIfTI (.nii/.nii.gz) is the workhorse (every reference tool), HR2 and
Octave cover the conversion tools; DICOM series go through the
from-scratch parser in ife_tpu.io.dicom (convert-dicom CLI).
"""
from __future__ import annotations

import numpy as np

from ife_tpu.core.volume import Volume
from ife_tpu.io.nifti import read_nifti, write_nifti
from ife_tpu.io.hr2 import read_hr2, write_hr2
from ife_tpu.io.octave import read_octave, write_octave


def read_volume(path: str) -> Volume:
    p = str(path)
    low = p.lower()
    if low.endswith((".nii", ".nii.gz")):
        return read_nifti(p)
    if low.endswith(".hr2"):
        return read_hr2(p)
    if low.endswith((".mat", ".octave", ".txt")):
        return read_octave(p)
    if low.endswith((".npy",)):
        return Volume(np.load(p))
    # sniff: HR2 magic, NIfTI header, else octave text
    with open(p, "rb") as f:
        head = f.read(4)
    if head[:2] == b"HR" and head[2:3] != b"3":
        return read_hr2(p)
    if head[:2] == b"\x1f\x8b" or head == b"\x5c\x01\x00\x00" or head[:1] == b"\x5c":
        return read_nifti(p)
    return read_nifti(p)


def write_volume(path: str, vol: Volume) -> None:
    p = str(path)
    low = p.lower()
    if low.endswith((".nii", ".nii.gz")):
        write_nifti(p, vol)
    elif low.endswith(".hr2"):
        write_hr2(p, vol)
    elif low.endswith((".mat", ".octave")):
        write_octave(p, vol)
    elif low.endswith(".npy"):
        np.save(p, np.asarray(vol.data))
    else:
        write_nifti(p, vol)
