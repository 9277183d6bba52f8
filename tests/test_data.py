"""Data pipeline tests with synthetic h5 volumes."""

import os

import numpy as np
import h5py
import pytest
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.data.paired_dataset import (
    VolumeDataset,
    AlignedVolumesDataset,
    ConcatDataset,
    get_paired_volume_datasets,
)
from spatialalignmentnetwork_tpu.data.loader import Loader, Prefetch
from spatialalignmentnetwork_tpu.data import augment as A


def make_h5(path, protocal, shape=(4, 24, 24), seed=0, maxval=2.0):
    from tests.conftest import write_h5_volume

    return write_h5_volume(path, protocal, shape=shape, seed=seed,
                           maxval=maxval)


@pytest.fixture
def data_dir(tmp_path):
    rows = []
    for v in range(2):
        t1 = tmp_path / f"p{v}_t1.h5"
        t2 = tmp_path / f"p{v}_t2.h5"
        make_h5(t1, "T1", seed=v * 2)
        make_h5(t2, "T2", seed=v * 2 + 1)
        rows.append(f"{t1.name},{t2.name}")
    csv = tmp_path / "pairs.csv"
    csv.write_text("\n".join(rows) + "\n")
    return tmp_path, csv


def test_volume_dataset_normalization_and_crop(data_dir):
    tmp_path, _ = data_dir
    ds = VolumeDataset(str(tmp_path / "p0_t1.h5"), crop=16)
    assert len(ds) == 4
    item = ds[0]
    assert item.shape == (1, 16, 16) and item.dtype == np.complex64
    assert item.real.max() <= 1.0 + 1e-6


def test_volume_dataset_q_trim(data_dir):
    tmp_path, _ = data_dir
    ds = VolumeDataset(str(tmp_path / "p0_t1.h5"), q=0.25)
    assert len(ds) == 2  # trims one slice each end


def test_aligned_dataset_protocol_matching_and_dummy(data_dir):
    tmp_path, _ = data_dir
    ds = AlignedVolumesDataset(
        str(tmp_path / "p0_t1.h5"), str(tmp_path / "p0_t2.h5"),
        protocals=["T2", "T1"], crop=16,
    )
    t2, t1 = ds[0]
    assert t2.shape == t1.shape == (1, 16, 16)
    # 'None' protocol -> zeros stand-in
    ds_none = AlignedVolumesDataset(
        str(tmp_path / "p0_t1.h5"), str(tmp_path / "p0_t2.h5"),
        protocals=["T2", "None"], crop=16,
    )
    _, zeros = ds_none[0]
    assert np.all(zeros == 0)


def test_csv_manifest_and_concat(data_dir):
    _, csv = data_dir
    vols = get_paired_volume_datasets(str(csv), protocals=["T2", "T1"], crop=16)
    assert len(vols) == 2
    cat = ConcatDataset(vols)
    assert len(cat) == 8
    item = cat[5]
    assert len(item) == 2


def test_loader_batching(data_dir):
    _, csv = data_dir
    vols = get_paired_volume_datasets(str(csv), protocals=["T2", "T1"], crop=16)
    cat = ConcatDataset(vols)
    loader = Loader(cat, batch_size=3, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    for b in batches:
        assert len(b) == 2
        assert b[0].shape == (3, 1, 16, 16)
        assert b[0].dtype == np.complex64


def test_prefetch(data_dir):
    _, csv = data_dir
    vols = get_paired_volume_datasets(str(csv), protocals=["T2", "T1"], crop=16)
    cat = ConcatDataset(vols)
    pre = Prefetch(cat)
    assert len(pre) == len(cat)
    np.testing.assert_array_equal(pre[3][0], cat[3][0])


def test_tiff_paired(tmp_path):
    imageio = pytest.importorskip("imageio")
    rng = np.random.default_rng(0)
    img = (rng.random((20, 40)) * 255).astype(np.uint8)  # side-by-side pair
    path = tmp_path / "pair.tiff"
    imageio.imwrite(path, img)
    from spatialalignmentnetwork_tpu.data.paired_dataset import TiffPaired

    ds = TiffPaired([str(path)], crop=16)
    assert len(ds) == 1
    t1, t2 = ds[0]
    assert t1.shape == t2.shape == (1, 16, 16)
    assert t1.dtype == np.complex64


# ------------------------------------------------------------ augmentation
def _cbatch(n=2, c=1, h=24, w=24, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.random((n, c, h, w)) + 1j * rng.random((n, c, h, w))).astype(
            np.complex64
        )
    )


def test_augment_policies_shapes():
    key = jax.random.PRNGKey(0)
    batch = [_cbatch(seed=0), _cbatch(seed=1)]
    for policy in ("None", "Rigid", "BSpline", "PBSpline"):
        out = A.augment_batch(policy, batch, key)
        assert len(out) == 2
        for x in out:
            assert x.shape == batch[0].shape and jnp.iscomplexobj(x)


def test_pbspline_shares_one_grid():
    key = jax.random.PRNGKey(1)
    x = _cbatch(seed=2)
    out = A.augment_batch("PBSpline", [x, x], key)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(out[1]), rtol=1e-5, atol=1e-6
    )


def test_rigid_grid_small_displacement():
    key = jax.random.PRNGKey(2)
    grid = A.rigid_grid(key, (4, 1, 24, 24))
    from spatialalignmentnetwork_tpu.ops.grid_sample import identity_grid

    ident = identity_grid((4, 1, 24, 24))
    disp = np.abs(np.asarray(grid - ident))
    assert disp.max() < 0.2  # small rotations/translations only


def test_scaled_deformation_factor_zero_is_identityish():
    key = jax.random.PRNGKey(3)
    x = _cbatch(seed=4)
    out0 = A.scaled_deformation(key, x, 1e-6)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-3)


def test_augment_deterministic_given_key():
    key = jax.random.PRNGKey(4)
    x = _cbatch(seed=5)
    a, _ = A.augment(x, key)
    b, _ = A.augment(x, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_batch_writes_h5_and_manifest(tmp_path, monkeypatch):
    """data.convert batch mode: h5 layout + pairs.csv the datasets consume
    (nibabel stubbed: the NIfTI decode is its job, the layout is ours)."""
    import sys
    import types

    import h5py

    from spatialalignmentnetwork_tpu.data import convert as C

    rng = np.random.default_rng(0)
    vols = {}

    class _FakeNii:
        def __init__(self, path):
            self.path = path

        def get_fdata(self):
            return vols[self.path]

    fake = types.ModuleType("nibabel")
    fake.load = lambda p: _FakeNii(p)
    fake.as_closest_canonical = lambda n: n
    monkeypatch.setitem(sys.modules, "nibabel", fake)

    for proto in ("T1", "T2"):
        d = tmp_path / proto
        d.mkdir()
        for v in range(2):
            path = str(d / f"s{v}.nii")
            vols[path] = rng.random((12, 10, 3)).astype(np.float64)  # HWS
            open(path, "w").close()

    out = tmp_path / "out"
    C.convert_batch([str(tmp_path / "T1"), str(tmp_path / "T2")],
                    ["T1", "T2"], str(out), "pairs.csv")

    rows = open(out / "pairs.csv").read().strip().splitlines()
    assert rows == ["v0000_T1.h5,v0000_T2.h5", "v0001_T1.h5,v0001_T2.h5"]
    with h5py.File(out / "v0000_T1.h5") as h5:
        assert h5["image"].shape == (3, 10, 12)  # slice-major transpose
        assert h5["image"].dtype == np.float32
        assert h5.attrs["acquisition"] == "T1"
        np.testing.assert_allclose(
            h5.attrs["max"], h5["image"][()].max(), rtol=1e-6
        )

    # the converted volumes load through the paired dataset end-to-end
    from spatialalignmentnetwork_tpu.data.paired_dataset import (
        get_paired_volume_datasets,
    )

    ds = get_paired_volume_datasets(str(out / "pairs.csv"),
                                    protocals=["T2", "T1"], crop=8)
    assert len(ds) == 2 and len(ds[0]) == 3


def test_loader_worker_exception_surfaces_not_hangs():
    """A corrupt item must raise in the consuming iterator; the producer
    thread previously died before its stop sentinel and training blocked
    on q.get() forever."""
    from spatialalignmentnetwork_tpu.data.loader import Loader

    class Corrupt:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise OSError("simulated unreadable volume")
            return [np.full((1, 4, 4), i, np.float32)]

    loader = Loader(Corrupt(), batch_size=2, shuffle=False, drop_last=True,
                    num_workers=2)
    with pytest.raises(OSError, match="simulated unreadable volume"):
        for _ in loader:
            pass


def test_zero_max_volume_rejected(tmp_path):
    import h5py
    from spatialalignmentnetwork_tpu.data.paired_dataset import VolumeDataset

    path = str(tmp_path / "blank_T1.h5")
    with h5py.File(path, "w") as h5:
        h5.create_dataset("image", data=np.zeros((4, 8, 8), np.float32))
        h5.attrs["max"] = 0.0
        h5.attrs["acquisition"] = "T1"
    with pytest.raises(ValueError, match="max attr is 0"):
        VolumeDataset(path)


def test_loader_abandoned_iterator_releases_producer(data_dir):
    """Breaking out of a Loader mid-epoch (train.py's intel_stop) must not
    leave the producer thread blocked on q.put holding fetched batches."""
    import gc
    import threading
    import time

    _, csv = data_dir
    vols = get_paired_volume_datasets(str(csv), protocals=["T2", "T1"], crop=16)
    cat = ConcatDataset(vols)
    before = set(threading.enumerate())
    loader = Loader(cat, batch_size=1, shuffle=False, drop_last=True,
                    prefetch_batches=1, num_workers=2)
    it = iter(loader)
    next(it)  # producer is now alive and blocked filling the queue
    it.close()  # abandonment: GeneratorExit -> finally -> cancel + drain
    del it
    gc.collect()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread(s) still alive: {leaked}"


def test_volumefolder_legacy_path(tmp_path):
    """Legacy folder-of-npy datasets (reference volumefolder.py:28-111):
    real+imag stacks load as complex64, q trims symmetrically, and
    adjacent complementary-protocol volumes pair up."""
    import json as _json

    from spatialalignmentnetwork_tpu.data import volumefolder as VF

    rng = np.random.default_rng(0)

    def mk_volume(name, protocal, n_slices=6, hw=12):
        d = tmp_path / name
        d.mkdir()
        (d / "description.json").write_text(
            _json.dumps({"acquisition": protocal})
        )
        slices = []
        for s in range(n_slices):
            arr = rng.standard_normal((2, hw, hw)).astype(np.float32)
            np.save(d / f"{s:03d}.npy", arr)
            slices.append(arr)
        return slices

    s_pd = mk_volume("v000", "CORPD_FBK")
    mk_volume("v001", "CORPDFS_FBK")
    mk_volume("v002", "CORPD_FBK")  # unpaired trailing volume

    vol = VF.VolumeDataset(str(tmp_path / "v000"), crop=8)
    assert len(vol) == 6
    item = vol[0]
    assert item.shape == (1, 8, 8) and item.dtype == np.complex64
    want = (s_pd[0][0] + 1j * s_pd[0][1])[2:10, 2:10]
    np.testing.assert_allclose(item[0], want, rtol=1e-6)

    # q trimming drops round(n*q) slices from both ends
    assert len(VF.VolumeDataset(str(tmp_path / "v000"), q=0.2)) == 4

    datasets = VF.get_aligned_volumes(str(tmp_path))
    assert len(datasets) == 1  # v000+v001 pair; v002 has no partner
    pair = datasets[0][1]
    assert len(pair) == 2
    assert all(p.shape == (1, 12, 12) for p in pair)
    assert all(p.dtype == np.complex64 for p in pair)


def test_volumefolder_pair_qc(tmp_path, capsys):
    """MI pair-QC tool (reference volumefolder.py:113-163): aligned volumes
    score higher MI than a shuffled mispair, CSV rows + summary print, and
    side-by-side JPEGs land in the image dir."""
    import json as _json

    from spatialalignmentnetwork_tpu.data import volumefolder as VF

    rng = np.random.default_rng(7)
    base = rng.uniform(0.1, 0.9, (4, 32, 32)).astype(np.float32)

    def mk_volume(name, protocal, vol):
        d = tmp_path / name
        d.mkdir()
        (d / "description.json").write_text(
            _json.dumps({"acquisition": protocal})
        )
        for s in range(vol.shape[0]):
            np.save(d / f"{s:03d}.npy",
                    np.stack([vol[s], np.zeros_like(vol[s])]))

    # v000/v001: genuinely aligned pair (same anatomy, contrast shift)
    mk_volume("v000", "CORPD_FBK", base)
    mk_volume("v001", "CORPDFS_FBK", np.clip(0.8 * base + 0.05, 0, 1))
    # v002/v003: "mispaired" — independent content
    mk_volume("v002", "CORPD_FBK", base)
    mk_volume("v003", "CORPDFS_FBK",
              rng.uniform(0.1, 0.9, (4, 32, 32)).astype(np.float32))

    img_dir = tmp_path / "imgs"
    mis = VF.pair_qc(str(tmp_path), str(img_dir), crop=32)
    assert len(mis) == 2
    assert mis[0] > mis[1]  # aligned pair scores higher MI than mispair

    out = capsys.readouterr().out.strip().splitlines()
    # one CSV row per pair + final summary line
    assert out[0].startswith("0,4,v000,v001,")
    assert out[1].startswith("4,4,v002,v003,")
    assert len(out[-1].split()) == 5
    # 8 side-by-side JPEGs (4 slices x 2 pairs)
    assert len(list(img_dir.glob("*.jpg"))) == 8

    # qc_mi matches the reference formula on a hand case: identical inputs
    # give MI == entropy of the marginal (up to eps smoothing)
    # (16 bins: at 200 bins the finite-sample bias of an independent pair
    # is O(bins²/2N) and swamps the signal at this sample count)
    x = rng.uniform(0, 1, 4096)
    m_same = VF.qc_mi(x, x, bins=16)
    m_indep = VF.qc_mi(x, rng.uniform(0, 1, 4096), bins=16)
    assert m_same > 1.0 and abs(m_indep) < 0.5
