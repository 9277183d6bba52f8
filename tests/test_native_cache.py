"""Native C++ slice-cache tests: build, pack, assemble, python parity."""

import shutil

import numpy as np
import h5py
import pytest

from spatialalignmentnetwork_tpu.data import native_cache as NC

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("make") is None,
    reason="no C++ toolchain (need both g++ and make)",
)


def _mk_h5(path, protocal, shape=(3, 20, 24), seed=0, maxval=3.0):
    rng = np.random.default_rng(seed)
    img = rng.random(shape).astype(np.float32) * maxval
    with h5py.File(path, "w") as h5:
        h5.create_dataset("image", data=img)
        h5.attrs["max"] = float(img.max())
        h5.attrs["acquisition"] = protocal
    return img


def test_build_and_assemble(tmp_path):
    imgs = []
    paths = []
    for v in range(2):
        p = tmp_path / f"v{v}.h5"
        imgs.append(_mk_h5(p, "T2", seed=v))
        paths.append(str(p))
    cache_path = str(tmp_path / "cache.bin")
    counts = NC.write_cache(paths, cache_path)
    assert counts == [3, 3]

    cache = NC.NativeSliceCache(cache_path)
    assert len(cache) == 6
    assert (cache.channels, cache.height, cache.width) == (1, 20, 24)

    # crop smaller than source
    out = cache.batch([0, 4], crop=16)
    assert out.shape == (2, 1, 16, 16) and out.dtype == np.complex64
    # python reference: normalize + center-crop
    from spatialalignmentnetwork_tpu.ops.crop import center_crop

    want0 = center_crop(imgs[0][0] / imgs[0].max(), (16, 16))
    np.testing.assert_allclose(out[0, 0].real, want0, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(out.imag, 0)

    # crop larger than source -> zero pad
    out2 = cache.batch([1], crop=32)
    assert out2.shape == (1, 1, 32, 32)
    want1 = center_crop(imgs[0][1] / imgs[0].max(), (32, 32))
    np.testing.assert_allclose(out2[0, 0].real, want1, rtol=1e-6, atol=1e-7)

    with pytest.raises(IndexError):
        cache.batch([99], crop=16)
    cache.close()


def test_paired_from_csv(tmp_path):
    rows = []
    for v in range(2):
        t1, t2 = tmp_path / f"p{v}_a.h5", tmp_path / f"p{v}_b.h5"
        _mk_h5(t1, "T1", seed=10 + v)
        _mk_h5(t2, "T2", seed=20 + v)
        rows.append(f"{t1.name},{t2.name}")
    csv = tmp_path / "pairs.csv"
    csv.write_text("\n".join(rows) + "\n")

    outs = NC.build_caches_from_csv(str(csv), ["T2", "T1"], str(tmp_path / "c"))
    ds = NC.NativePairedSlices(outs, crop=16)
    assert len(ds) == 6
    batch = ds.batch([0, 1, 5])
    assert len(batch) == 2
    assert batch[0].shape == (3, 1, 16, 16)
    # parity vs the python h5 dataset layer
    from spatialalignmentnetwork_tpu.data.paired_dataset import (
        get_paired_volume_datasets, ConcatDataset,
    )

    vols = get_paired_volume_datasets(str(csv), protocals=["T2", "T1"], crop=16)
    cat = ConcatDataset(vols)
    for bi, si in enumerate([0, 1, 5]):
        item = cat[si]
        np.testing.assert_allclose(
            batch[0][bi], item[0], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            batch[1][bi], item[1], rtol=1e-6, atol=1e-7
        )
