"""Legacy folder-of-npy-slices dataset (fastMRI-knee era).

Equivalent of the reference volumefolder.py:28-111: volumes stored as
directories of per-slice .npy files plus a `description.json` holding the
acquisition protocol; `get_aligned_volumes` pairs CORPD_FBK / CORPDFS_FBK
knee protocol volumes by folder adjacency. Not used by the live brain
T1/T2 pipeline (kept for data-compatibility with older experiments).
"""

import os
import json
import glob

import numpy as np

from ..ops.crop import center_crop


class VolumeDataset:
    """One volume = folder of per-slice npy files (real+imag stacked)."""

    def __init__(self, folder, crop=None, q=0):
        assert q < 0.5
        self.folder = folder
        self.crop = crop
        with open(os.path.join(folder, "description.json")) as f:
            self.description = json.load(f)
        self.protocal = self.description.get("acquisition")
        self.slices = sorted(glob.glob(os.path.join(folder, "*.npy")))
        n = len(self.slices)
        self.start = round(n * q)
        self.stop = n - self.start

    def __len__(self):
        return self.stop - self.start

    def __getitem__(self, index):
        arr = np.load(self.slices[index + self.start])
        if arr.ndim == 3 and arr.shape[0] == 2:  # [real, imag] stack
            arr = (arr[0] + 1j * arr[1])[None]
        elif arr.ndim == 2:
            arr = arr[None]
        if self.crop is not None:
            arr = center_crop(arr, (self.crop, self.crop))
        return arr.astype(np.complex64)


class AlignedVolumesDataset:
    def __init__(self, *folders, protocals, crop=None, q=0):
        volumes = [VolumeDataset(f, crop=crop, q=q) for f in folders]
        assert len({len(v) for v in volumes}) == 1
        by_protocal = {v.protocal: v for v in volumes}
        self.volumes = [by_protocal[p] for p in protocals]

    def __len__(self):
        return len(self.volumes[0])

    def __getitem__(self, index):
        return [v[index] for v in self.volumes]


def get_volumes(root):
    """All volume folders under root (those holding description.json)."""
    out = []
    for folder in sorted(glob.glob(os.path.join(root, "*"))):
        if os.path.isfile(os.path.join(folder, "description.json")):
            out.append(VolumeDataset(folder))
    return out


def get_aligned_volumes(root, protocals=("CORPD_FBK", "CORPDFS_FBK"),
                        crop=None, q=0):
    """Pair adjacent volumes with complementary knee protocols
    (reference volumefolder.py:93-111)."""
    volumes = get_volumes(root)
    datasets = []
    i = 0
    while i < len(volumes) - 1:
        a, b = volumes[i], volumes[i + 1]
        if {a.protocal, b.protocal} == set(protocals) and len(a) == len(b):
            datasets.append(
                AlignedVolumesDataset(
                    a.folder, b.folder, protocals=list(protocals),
                    crop=crop, q=q,
                )
            )
            i += 2
        else:
            i += 1
    return datasets
