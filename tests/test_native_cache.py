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
    from tests.conftest import write_h5_volume

    return write_h5_volume(path, protocal, shape=shape, seed=seed,
                           maxval=maxval)


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


def test_write_cache_rejects_mixed_shapes(tmp_path):
    """Heterogeneous volume shapes must raise loudly (a stripped assert
    would write a header whose strides mismatch later volumes' bytes)."""
    a = tmp_path / "a.h5"
    b = tmp_path / "b.h5"
    _mk_h5(a, "T2", shape=(2, 20, 24), seed=0)
    _mk_h5(b, "T2", shape=(2, 18, 24), seed=1)
    with pytest.raises(ValueError, match="uniform slice shape"):
        NC.write_cache([str(a), str(b)], str(tmp_path / "c.bin"))


def test_write_cache_rejects_complex_volumes(tmp_path):
    """The f32 store would silently drop imaginary parts; must refuse."""
    p = tmp_path / "cplx.h5"
    rng = np.random.default_rng(0)
    img = (rng.random((2, 8, 8)) + 1j * rng.random((2, 8, 8))).astype(
        np.complex64
    )
    with h5py.File(p, "w") as h5:
        h5.create_dataset("image", data=img)
        h5.attrs["max"] = 1.0
        h5.attrs["acquisition"] = "T2"
    with pytest.raises(ValueError, match="complex"):
        NC.write_cache([str(p)], str(tmp_path / "c.bin"))


def test_build_caches_rejects_misaligned_volumes(tmp_path):
    """Equal TOTALS with mismatched per-volume counts would silently pair
    every slice after the first mismatch with the wrong cross-modality
    slice; the build must refuse."""
    rows = []
    # volume 0: T1 has 2 slices, T2 has 3; volume 1: T1 3, T2 2 (totals 5=5)
    for v, (s1, s2) in enumerate([(2, 3), (3, 2)]):
        t1, t2 = tmp_path / f"m{v}_a.h5", tmp_path / f"m{v}_b.h5"
        _mk_h5(t1, "T1", shape=(s1, 20, 24), seed=10 + v)
        _mk_h5(t2, "T2", shape=(s2, 20, 24), seed=20 + v)
        rows.append(f"{t1.name},{t2.name}")
    csv = tmp_path / "pairs.csv"
    csv.write_text("\n".join(rows) + "\n")
    with pytest.raises(ValueError, match="per-volume slice counts"):
        NC.build_caches_from_csv(str(csv), ["T2", "T1"], str(tmp_path / "c"))


def test_cache_rebuilds_when_h5_regenerated(tmp_path):
    """reuse=True must not shadow a regenerated volume: freshness is
    checked against the newest h5, not only the CSV."""
    import os
    import time

    t1, t2 = tmp_path / "r_a.h5", tmp_path / "r_b.h5"
    _mk_h5(t1, "T1", seed=1)
    img_old = _mk_h5(t2, "T2", seed=2)
    csv = tmp_path / "pairs.csv"
    csv.write_text(f"{t1.name},{t2.name}\n")
    out_dir = str(tmp_path / "c")
    outs = NC.build_caches_from_csv(str(csv), ["T2", "T1"], out_dir)
    # regenerate the T2 volume with different data, CSV untouched
    time.sleep(0.05)
    img_new = _mk_h5(t2, "T2", seed=99)
    os.utime(t2)  # ensure mtime advances even on coarse filesystems
    assert not np.allclose(img_old, img_new)
    outs2 = NC.build_caches_from_csv(str(csv), ["T2", "T1"], out_dir)
    ds = NC.NativePairedSlices(outs2, crop=20)
    got = ds.batch([0])[0][0, 0]  # first T2 slice, full height
    want = (img_new[0] / img_new.max())[:, 2:22]  # center-crop 24 -> 20 cols
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
