"""Paired-volume h5 slice datasets.

Framework-independent (numpy) re-implementation of the reference data layer
(paired_dataset.py:31-122): per-volume h5 files with an `image` dataset
[S, H, W] or [S, C, H, W] and `max`/`acquisition` attrs; volumes are matched
into aligned multi-modality groups by protocol name from a CSV manifest;
slices normalize to [0, 1] by the volume max and center-crop to a square;
protocol 'None' substitutes an all-zeros dummy modality.

Slices are returned as complex64 [C, H, W] numpy arrays (host side); the
device-side preprocessing (FFT, masking, augmentation) happens inside the
jitted train step.
"""

import os

import numpy as np
import h5py

from ..ops.crop import center_crop


class VolumeDataset:
    """Slices of one h5 volume (reference paired_dataset.py:31-73)."""

    def __init__(self, volume, crop=None, q=0, flatten_channels=False):
        assert q < 0.5
        self.volume = volume
        self.flatten_channels = flatten_channels
        self.crop = crop
        with h5py.File(volume, "r") as h5:
            shape = h5["image"].shape
            if len(shape) == 3:
                assert not flatten_channels
                length, self.channels = shape[0], 1
            elif len(shape) == 4:
                length, self.channels = shape[0:2]
            else:
                raise ValueError(f"bad image rank in {volume}")
            self.protocal = h5.attrs["acquisition"]
            self.max_val = h5.attrs["max"]
            if not self.max_val > 0:
                raise ValueError(
                    f"{volume}: max attr is {self.max_val}; slices would "
                    "normalize to NaN"
                )
        self.start = round(length * q)  # inclusive
        self.stop = length - self.start  # exclusive

    def __len__(self):
        n = self.stop - self.start
        return n * self.channels if self.flatten_channels else n

    def __getitem__(self, index):
        with h5py.File(self.volume, "r") as h5:
            if self.flatten_channels:
                i = h5["image"][index // self.channels + self.start]
                i = i[index % self.channels][None, ...]
            else:
                i = h5["image"][index + self.start][()]
                if i.ndim != 3:
                    i = i[None, ...]
        i = i / self.max_val
        if self.crop is not None:
            i = center_crop(i, (self.crop, self.crop))
        if i.ndim == 2:
            i = i[None, :, :]
        return i.astype(np.complex64)


class DummyVolumeDataset:
    """All-zeros stand-in for an absent modality (protocol 'None')."""

    def __init__(self, ref):
        sample = ref[0]
        self.shape = sample.shape
        self.dtype = sample.dtype
        self.len = len(ref)

    def __len__(self):
        return self.len

    def __getitem__(self, index):
        return np.zeros(self.shape, dtype=self.dtype)


class AlignedVolumesDataset:
    """Match volumes by acquisition protocol; yield [target, aux, ...] lists
    of aligned slices (reference paired_dataset.py:89-110)."""

    def __init__(self, *volumes, protocals, crop=None, q=0,
                 flatten_channels=False):
        volumes = [
            VolumeDataset(x, crop, q=q, flatten_channels=flatten_channels)
            for x in volumes
        ]
        assert len({len(x) for x in volumes}) == 1
        assert len({x[0].shape for x in volumes}) == 1
        self.crop = crop
        by_protocal = {v.protocal: v for v in volumes}
        by_protocal["None"] = DummyVolumeDataset(next(iter(by_protocal.values())))
        for x in protocals:
            assert x in by_protocal, f"{x} not found in {list(by_protocal)}"
        self.volumes = [by_protocal[p] for p in protocals]

    def __len__(self):
        return len(self.volumes[0])

    def __getitem__(self, index):
        return [volume[index] for volume in self.volumes]


class ConcatDataset:
    """Concatenation of map-style datasets (slice-level view of volumes)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, index):
        if index < 0:
            index += len(self)
        di = int(np.searchsorted(self.offsets, index, side="right")) - 1
        return self.datasets[di][index - int(self.offsets[di])]


class TiffPaired:
    """Side-by-side paired tiff images -> (t1, t2) complex slices
    (reference paired_dataset.py:124-142; needs imageio)."""

    def __init__(self, tiffs, crop=None):
        self.tiffs = list(tiffs)
        self.crop = crop

    def __len__(self):
        return len(self.tiffs)

    def __getitem__(self, ind):
        import imageio

        img = np.asarray(imageio.imread(self.tiffs[ind]))
        assert img.ndim == 2
        t1, t2 = np.split(img, 2, axis=-1)
        out = []
        for x in (t1, t2):
            x = x[None].astype(np.complex64)
            if self.crop is not None:
                x = center_crop(x, (self.crop, self.crop))
            out.append(x)
        return out


def get_paired_volume_datasets(csv_path, protocals=None, crop=None, q=0,
                               flatten_channels=False):
    """CSV manifest -> list of per-volume AlignedVolumesDatasets
    (reference paired_dataset.py:112-122)."""
    datasets = []
    basepath = os.path.dirname(os.path.abspath(csv_path))
    with open(csv_path, "r") as f:
        for line in f.readlines():
            paths = [
                os.path.join(basepath, p) for p in line.strip().split(",")
            ]
            datasets.append(
                AlignedVolumesDataset(
                    *paths, protocals=protocals, crop=crop, q=q,
                    flatten_channels=flatten_channels,
                )
            )
    return datasets
