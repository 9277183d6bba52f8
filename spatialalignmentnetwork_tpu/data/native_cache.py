"""Native slice-cache: build + ctypes bindings.

High-throughput replacement for per-item h5py reads: a CSV manifest of
paired volumes is compiled once into a contiguous float32 cache file per
modality (slices pre-normalized by volume max), and the C++ OpenMP library
(native/slicecache.cpp) assembles center-cropped complex64 batches straight
from the memory map. Falls back cleanly when the shared library has not
been built (`make -C native`).
"""

import ctypes
import os
import subprocess

import numpy as np
import h5py

MAGIC = 0x53414E43414348

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libslicecache.so")


def build_library(force=False):
    """Compile native/libslicecache.so (g++ -fopenmp). Returns the path.

    Rebuilds when the source is newer than the library — a stale binary
    (e.g. one checked out from elsewhere) must not shadow source changes.
    flock-serialized: multi-process training (every worker constructs a
    NativeSliceCache) must not relink the .so while a sibling dlopens it.
    """
    import fcntl

    src = os.path.join(_REPO_ROOT, "native", "slicecache.cpp")

    def stale():
        return (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )

    if force or stale():
        with open(_LIB_PATH + ".buildlock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if force or stale():  # a sibling may have built while we waited
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                    check=True, capture_output=True,
                )
    return _LIB_PATH


_LIB = None


def _load_lib():
    """dlopen + bind once per process (cached: every NativeSliceCache used
    to re-run CDLL, and a concurrent rebuild could swap the .so mid-load)."""
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(build_library())
    lib.cache_open.restype = ctypes.c_void_p
    lib.cache_open.argtypes = [ctypes.c_char_p]
    lib.cache_num_slices.restype = ctypes.c_int64
    lib.cache_num_slices.argtypes = [ctypes.c_void_p]
    lib.cache_shape.restype = None
    lib.cache_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.cache_assemble_batch.restype = ctypes.c_int
    lib.cache_assemble_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cache_close.restype = None
    lib.cache_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def write_cache(volume_paths, out_path):
    """Pack normalized slices of h5 volumes into one cache file.

    Constraints vs the general python loader (loud errors, never silent
    divergence): all volumes must share one (C, H, W) slice shape — the
    binary format stores a single shape and assembly-time crops are
    computed against it, so mixing shapes would silently shift crops
    relative to VolumeDataset's per-volume semantics — and the image data
    must be real-valued (the f32 store would drop imaginary parts).
    Returns per-volume slice counts.
    """
    counts = []
    first = True
    with open(out_path, "wb") as f:
        header_pos = f.tell()
        f.write(np.zeros(5, dtype=np.int64).tobytes())  # placeholder
        total, C = 0, 1
        H = W = None
        for path in volume_paths:
            with h5py.File(path, "r") as h5:
                raw = h5["image"]
                if np.issubdtype(raw.dtype, np.complexfloating):
                    raise ValueError(
                        f"{path}: complex-valued image dataset; the native "
                        "f32 cache would drop the imaginary part — use the "
                        "python loader for complex volumes"
                    )
                img = np.asarray(raw, dtype=np.float32)
                peak = np.float32(h5.attrs["max"])
                if not peak > 0:
                    raise ValueError(
                        f"{path}: max attr is {peak}; slices would "
                        "normalize to NaN"
                    )
                img = img / peak
            if img.ndim == 3:
                img = img[:, None]
            s, c, h, w = img.shape
            if first:
                C, H, W = c, h, w
                first = False
            if (c, h, w) != (C, H, W):
                # a stripped assert here would write a cache whose header
                # shape mismatches later volumes' strides -> silent garbage
                raise ValueError(
                    f"{path}: volume shape {(c, h, w)} != cache shape "
                    f"{(C, H, W)}; the native cache requires one uniform "
                    "slice shape per protocol — use the python loader for "
                    "mixed-shape splits"
                )
            f.write(np.ascontiguousarray(img).tobytes())
            counts.append(s)
            total += s
        f.seek(header_pos)
        f.write(np.asarray([MAGIC, total, C, H, W], dtype=np.int64).tobytes())
    return counts


class NativeSliceCache:
    """Memory-mapped slice store with native batch assembly."""

    def __init__(self, path):
        self._lib = _load_lib()
        self._handle = self._lib.cache_open(path.encode())
        if not self._handle:
            raise OSError(f"cannot open cache {path}")
        chw = (ctypes.c_int64 * 3)()
        self._lib.cache_shape(self._handle, chw)
        self.channels, self.height, self.width = chw[0], chw[1], chw[2]

    def __len__(self):
        return int(self._lib.cache_num_slices(self._handle))

    def batch(self, indices, crop):
        """indices -> [N, C, crop, crop] complex64 batch."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(idx)
        out = np.empty((n, self.channels, crop, crop), dtype=np.complex64)
        rc = self._lib.cache_assemble_batch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, crop, crop,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IndexError("slice index out of range")
        return out

    def close(self):
        if self._handle:
            self._lib.cache_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativePairedSlices:
    """Paired-modality dataset over native caches built from the same CSV
    manifest; drop-in for ConcatDataset+Loader fetch. Single-modal runs
    (protocals like ['T2', 'None']) get ONE cache here — the zeros dummy
    the python DummyVolumeDataset would supply is synthesized downstream
    by CSModel.set_input(img_aux=None) instead of being stored/shipped."""

    def __init__(self, cache_paths, crop):
        self.caches = [NativeSliceCache(p) for p in cache_paths]
        lens = {len(c) for c in self.caches}
        if len(lens) != 1:
            # backstop only: build_caches_from_csv validates the stronger
            # PER-VOLUME alignment invariant (equal totals can still hide
            # mis-paired volumes)
            raise ValueError(
                f"modalities must align slice-for-slice, got totals {lens}"
            )
        self.crop = crop

    def __len__(self):
        return len(self.caches[0])

    def batch(self, indices):
        return [c.batch(indices, self.crop) for c in self.caches]

    def __getitem__(self, ind):
        """Single item [modality...] of [C, crop, crop] — the same protocol
        as the python paired datasets, so vis-batch indexing works."""
        return [c.batch(np.asarray([ind]), self.crop)[0] for c in self.caches]


def build_caches_from_csv(csv_path, protocals, out_dir, reuse=True):
    """Compile a paired CSV manifest into one cache file per protocol.

    The manifest resolution mirrors get_paired_volume_datasets'
    acquisition-attr matching (paired_dataset.py) on purpose-flat code;
    'None' protocols produce no cache file — the single-modal zeros dummy
    is synthesized downstream by CSModel.set_input, not stored. Per-volume
    slice counts are validated to match ACROSS protocols at build time
    (the python AlignedVolumesDataset asserts the same invariant): equal
    totals with mismatched per-volume counts would silently pair every
    later slice with the wrong cross-modality slice.

    reuse=True skips protocols whose cache file is newer than the CSV AND
    every h5 volume it was built from (a regenerated volume must not be
    shadowed by a stale cache). Writes go to a pid-suffixed temp file
    swapped in atomically, so concurrent builders (multi-host training)
    never observe a torn cache.
    """
    os.makedirs(out_dir, exist_ok=True)
    basepath = os.path.dirname(os.path.abspath(csv_path))
    per_protocol = {p: [] for p in protocals if p != "None"}
    with open(csv_path) as f:
        for line in f.readlines():
            paths = [os.path.join(basepath, p) for p in line.strip().split(",")]
            by_acq = {}
            for path in paths:
                with h5py.File(path, "r") as h5:
                    by_acq[h5.attrs["acquisition"]] = path
            for p in per_protocol:
                per_protocol[p].append(by_acq[p])
    import json

    outs = []
    per_volume_counts = {}
    for p, vols in per_protocol.items():
        out = os.path.join(out_dir, f"cache_{p}.bin")
        counts_path = out + ".counts.json"
        newest_input = max(
            [os.path.getmtime(csv_path)]
            + [os.path.getmtime(v) for v in vols]
        )
        if (reuse and os.path.exists(out) and os.path.exists(counts_path)
                and os.path.getmtime(out) > newest_input):
            with open(counts_path) as cf:
                per_volume_counts[p] = json.load(cf)
        else:
            tmp = f"{out}.tmp.{os.getpid()}"
            counts = write_cache(vols, tmp)
            with open(f"{counts_path}.tmp.{os.getpid()}", "w") as cf:
                json.dump(counts, cf)
            os.replace(tmp, out)
            os.replace(f"{counts_path}.tmp.{os.getpid()}", counts_path)
            per_volume_counts[p] = counts
        outs.append(out)
    if len(per_volume_counts) > 1:
        ref_p, ref_counts = next(iter(per_volume_counts.items()))
        for p, cnts in per_volume_counts.items():
            if cnts != ref_counts:
                raise ValueError(
                    f"per-volume slice counts differ between protocols "
                    f"{ref_p} and {p}: {ref_counts} vs {cnts}; the caches "
                    "would mis-pair slices across modalities"
                )
    return outs
