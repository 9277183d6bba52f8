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


def qc_mi(x, y, bins=200, eps=1e-6):
    """Whole-volume MI used by the legacy pair-QC tool.

    Matches the reference's QC formula (volumefolder.py:115-124): values
    clipped to [0, 1], a 200-bin joint histogram over the full volume
    (NOT per-slice like utils.metrics.mi), and the eps-smoothed KL form
    sum(pxy * log((pxy+eps)/(px*py+eps))).
    """
    x, y = (np.clip(np.asarray(v), 0, 1).ravel().astype(np.float64)
            for v in (x, y))
    pxy = np.histogram2d(x, y, bins, range=((0, 1), (0, 1)))[0]
    pxy = pxy / pxy.sum()
    px = pxy.sum(axis=1)
    py = pxy.sum(axis=0)
    px_py = px[:, None] * py[None, :]
    return float(np.sum(pxy * np.log((pxy + eps) / (px_py + eps))))


def pair_qc(root, image_dir=None, crop=256, bins=200):
    """Sanity-check protocol pairing by mutual information.

    The reference's ``__main__`` tool (volumefolder.py:113-163): for every
    aligned volume pair, center-crop the magnitude stacks to ``crop``²,
    compute whole-volume MI, print one CSV row per pair
    (index,len,folderA,folderB,mi), optionally dump side-by-side slice
    JPEGs to ``image_dir``, and finally print max/min/mean/std of the MI
    distribution. A mispaired volume shows up as an MI outlier.

    Returns the list of per-pair MI values (the reference only printed).
    """
    pairs = get_aligned_volumes(root)
    mis = []
    cnt = 0
    for ds in pairs:
        a, b = ds.volumes
        try:
            stacks = [
                np.abs(np.concatenate([v[i] for i in range(len(v))], 0))
                for v in (a, b)
            ]
        except Exception as e:  # unreadable volume: skip, like the reference
            print(f"# skipping {a.folder}: {e}")
            continue
        pd, pdfs = (center_crop(s, (crop, crop)) for s in stacks)
        m = qc_mi(pd, pdfs, bins=bins)
        print(cnt, len(ds), os.path.basename(a.folder),
              os.path.basename(b.folder), m, sep=",")
        if image_dir is not None:
            from PIL import Image
            os.makedirs(image_dir, exist_ok=True)
            for offset, (x, y) in enumerate(zip(pd, pdfs)):
                img = np.concatenate((x, np.ones((x.shape[0], 5)), y), 1)
                img = np.clip(np.floor(img * 256), 0, 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(image_dir, f"{cnt + offset:010d}.jpg"))
        mis.append(m)
        cnt += len(ds)
    if mis:
        print(len(mis), np.max(mis), np.min(mis), np.mean(mis), np.std(mis))
    else:
        print("no aligned volume pairs found under", root)
    return mis


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="MI-based pairing QC over a legacy volume folder "
                    "(reference volumefolder.py:113-163)")
    ap.add_argument("root", help="folder of volume folders")
    ap.add_argument("image_dir", nargs="?", default=None,
                    help="optional dir for side-by-side slice JPEGs")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--bins", type=int, default=200)
    a = ap.parse_args()
    pair_qc(a.root, a.image_dir, crop=a.crop, bins=a.bins)
