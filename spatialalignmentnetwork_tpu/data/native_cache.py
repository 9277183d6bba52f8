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
    """
    src = os.path.join(_REPO_ROOT, "native", "slicecache.cpp")
    stale = (
        not os.path.exists(_LIB_PATH)
        or os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if force or stale:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True, capture_output=True,
        )
    return _LIB_PATH


def _load_lib():
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
    return lib


def write_cache(volume_paths, out_path):
    """Pack normalized slices of h5 volumes into one cache file.

    All volumes must share the slice shape. Returns per-volume slice counts.
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
                img = np.asarray(h5["image"], dtype=np.float32)
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
            assert (c, h, w) == (C, H, W), "heterogeneous volume shapes"
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
    """Paired-modality dataset over two native caches (target, aux) built
    from the same CSV manifest; drop-in for ConcatDataset+Loader fetch."""

    def __init__(self, cache_paths, crop):
        self.caches = [NativeSliceCache(p) for p in cache_paths]
        lens = {len(c) for c in self.caches}
        assert len(lens) == 1, "modalities must align slice-for-slice"
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

    reuse=True skips protocols whose cache file is newer than the CSV.
    Writes go to a pid-suffixed temp file swapped in atomically, so
    concurrent builders (multi-host training) never observe a torn cache.
    """
    os.makedirs(out_dir, exist_ok=True)
    # resolve each protocol's volume file list via the python dataset layer
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
    outs = []
    for p, vols in per_protocol.items():
        out = os.path.join(out_dir, f"cache_{p}.bin")
        if not (reuse and os.path.exists(out)
                and os.path.getmtime(out) > os.path.getmtime(csv_path)):
            tmp = f"{out}.tmp.{os.getpid()}"
            write_cache(vols, tmp)
            os.replace(tmp, out)
        outs.append(out)
    return outs
