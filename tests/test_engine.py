"""Engine tests: config, checkpointing, and one Mixed train step."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.engine.config import Config
from spatialalignmentnetwork_tpu.engine.checkpoint import (
    flatten_tree, unflatten_tree, ckpt_save, ckpt_load,
)
from spatialalignmentnetwork_tpu.engine.csmodel import CSModel


def tiny_cfg(reg="Mixed", shape=16):
    cfg = Config()
    cfg.sparsity = 0.25
    cfg.lr = 1e-4
    cfg.shape = shape
    cfg.coils = 1
    cfg.reg = reg
    cfg.mask = "equispaced"
    cfg.weight_smooth = 1000.0
    cfg.weight_gan = 0.1
    cfg.weight_gan_sim = 1.0
    cfg.weight_sim = 1.0
    cfg.net_G_layers = (4, 8)
    cfg.net_D_blocks = ((4,), (8,))
    cfg.net_T_layers = (4, 8)
    cfg.net_R_cascades = 1
    cfg.net_R_chans = 4
    cfg.net_R_sens_chans = 4
    cfg.net_R_pools = 1
    cfg.net_R_sens_pools = 1
    return cfg


def _batch(shape=16, n=4, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: (rng.random((n, 1, shape, shape))
                  + 1j * rng.random((n, 1, shape, shape))).astype(np.complex64)
    return mk(), mk()


def test_config_roundtrip(tmp_path):
    cfg = tiny_cfg()
    path = str(tmp_path / "config")
    cfg.save(path)
    cfg2 = Config().load(path)
    assert cfg2.reg == "Mixed" and cfg2.shape == 16
    assert list(cfg2.net_G_layers) == [4, 8]
    assert "sparsity" in cfg2
    assert cfg2["lr"] == 1e-4


def test_flatten_unflatten():
    tree = {"a": {"b": np.ones(2), "c": np.zeros(3)}, "d": np.arange(4)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])


def test_mixed_train_step_updates_all_nets():
    cfg = tiny_cfg("Mixed")
    net = CSModel(cfg=cfg)
    before = jax.tree_util.tree_map(np.asarray, net.state["params"])
    full, aux = _batch()
    net.set_input(full, aux)
    net.update()
    after = net.state["params"]
    for name in ("net_T", "net_G", "net_R", "net_D"):
        diff = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(after[name]),
                jax.tree_util.tree_leaves(before[name]),
            )
        )
        assert diff > 0, f"{name} unchanged after Mixed step"
    scalars = net.get_vis("scalars")["scalars"]
    for key in ("loss_all", "loss_sim", "loss_smooth", "loss_gan_sim",
                "loss_gan_G", "loss_gan_Dfake", "loss_gan_Dreal"):
        assert key in scalars and np.isfinite(scalars[key])


def test_none_regime_only_updates_R():
    cfg = tiny_cfg("None")
    net = CSModel(cfg=cfg)
    before = jax.tree_util.tree_map(np.asarray, net.state["params"])
    full, aux = _batch(seed=5)
    net.set_input(full, aux)
    net.update()
    after = net.state["params"]

    def total_diff(name):
        return sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(after[name]),
                jax.tree_util.tree_leaves(before[name]),
            )
        )

    assert total_diff("net_R") > 0
    assert total_diff("net_G") == 0
    assert total_diff("net_D") == 0
    # net_T params frozen, but BatchNorm running stats DO update (parity
    # with torch train-mode no_grad forward)
    assert total_diff("net_T") == 0


def test_checkpoint_roundtrip_and_partial_load(tmp_path):
    cfg = tiny_cfg("Mixed")
    net = CSModel(cfg=cfg)
    full, aux = _batch(seed=7)
    net.set_input(full, aux)
    net.update()
    path = str(tmp_path / "ckpt.pt")
    net.save(path)
    assert os.path.isdir(path)
    assert set(os.listdir(path)) >= {"net_G", "net_D", "net_T", "net_R",
                                     "net_mask", "config"}

    # full reload (no cfg -> restored from ckpt)
    net2 = CSModel(ckpt=path)
    for name in ("net_G", "net_R"):
        for a, b in zip(
            jax.tree_util.tree_leaves(net.state["params"][name]),
            jax.tree_util.tree_leaves(net2.state["params"][name]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(net.state["pruned"]), np.asarray(net2.state["pruned"])
    )

    # partial load: only net_T from ckpt, rest fresh
    net3 = CSModel(ckpt=path, cfg=tiny_cfg("Mixed"), objects=["net_T"])
    for a, b in zip(
        jax.tree_util.tree_leaves(net.state["params"]["net_T"]),
        jax.tree_util.tree_leaves(net3.state["params"]["net_T"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diff_G = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(net.state["params"]["net_G"]),
            jax.tree_util.tree_leaves(net3.state["params"]["net_G"]),
        )
    )
    assert diff_G > 0  # net_G was NOT loaded


def test_grad_accum_matches_full_batch():
    """grad_accum=2 on a batch of 4 must produce the same parameter update
    as the plain step on the same batch (loss is a mean, so averaged
    micro-batch grads == full-batch grads; BN uses micro-batch stats, so
    compare the BN-free net_R only ... net_R has no BN at all)."""
    full, aux = _batch(seed=81)
    # zeros aux: net_T's train-mode BatchNorm output is then independent of
    # the batch split, isolating the gradient-averaging equivalence
    zeros_aux = np.zeros_like(aux)

    cfg_a = tiny_cfg("None")
    net_a = CSModel(cfg=cfg_a, seed=3)
    net_a.set_input(full, zeros_aux)
    net_a.update()

    cfg_b = tiny_cfg("None")
    cfg_b.grad_accum = 2
    net_b = CSModel(cfg=cfg_b, seed=3)
    net_b.set_input(full, zeros_aux)
    net_b.update()

    for a, b in zip(
        jax.tree_util.tree_leaves(net_a.state["params"]["net_R"]),
        jax.tree_util.tree_leaves(net_b.state["params"]["net_R"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )
    scal_b = net_b.get_vis("scalars")["scalars"]
    assert np.isfinite(scal_b["loss_all"])


def test_grad_accum_mixed_matches_full_batch():
    """Mixed-regime accumulation (framework-defined semantics: G-phase and
    D-phase grads each average into ONE step per global batch, micro-batches
    split each TR/RT crossover half). With a global batch whose half-slices
    make every micro-batch identical, duplicated rows have the same batch
    statistics as a single copy, so accum==no-accum must hold to float
    tolerance for ALL nets including BatchNorm net_D."""
    import optax

    full2, aux2 = _batch(n=2, seed=92)
    rep = lambda x: np.concatenate([x[:1], x[:1], x[1:], x[1:]], axis=0)
    full, aux = rep(np.asarray(full2)), rep(np.asarray(aux2))

    def to_sgd(net):
        # plain SGD makes the post-step params a direct read of the grads
        # (AdamW's sign normalization amplifies float noise on zero-grad
        # elements to a full +-lr step, masking real equivalence)
        net.tx = {k: optax.sgd(1e-2) for k in net.tx}
        net.state["opt"] = {
            k: net.tx[k].init(net.state["params"][k]) for k in net.tx
        }
        return net

    net_a = to_sgd(CSModel(cfg=tiny_cfg("Mixed"), seed=4))
    net_a.set_input(full, aux)
    net_a.update()

    cfg_b = tiny_cfg("Mixed")
    cfg_b.grad_accum = 2
    net_b = to_sgd(CSModel(cfg=cfg_b, seed=4))
    net_b.set_input(full, aux)
    net_b.update()

    for name in ("net_T", "net_G", "net_R", "net_D"):
        for a, b in zip(
            jax.tree_util.tree_leaves(net_a.state["params"][name]),
            jax.tree_util.tree_leaves(net_b.state["params"][name]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                err_msg=name,
            )
    la = net_a.get_vis("scalars")["scalars"]
    lb = net_b.get_vis("scalars")["scalars"]
    for k in ("loss_all", "loss_gan_sim", "loss_gan_Dfake", "loss_gan_Dreal"):
        assert abs(la[k] - lb[k]) <= 1e-3 * max(1.0, abs(la[k])), (
            k, la[k], lb[k]
        )


def test_grad_accum_gan_only_step_runs():
    cfg = tiny_cfg("GAN-Only")
    cfg.grad_accum = 2
    net = CSModel(cfg=cfg, seed=5)
    full, aux = _batch(n=8, seed=93)
    before_D = jax.tree_util.tree_map(np.asarray, net.state["params"]["net_D"])
    net.set_input(full, aux)
    net.update()
    assert np.isfinite(net.get_vis("scalars")["scalars"]["loss_all"])
    changed = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(
            jax.tree_util.tree_leaves(net.state["params"]["net_D"]),
            jax.tree_util.tree_leaves(before_D),
        )
    )
    assert changed, "net_D did not update under GAN-Only accumulation"

    # Rec regime runs too (T gets gradients through the ref channel)
    cfg_c = tiny_cfg("Rec")
    cfg_c.grad_accum = 2
    net_c = CSModel(cfg=cfg_c, seed=3)
    net_c.set_input(full, aux)
    net_c.update()
    assert np.isfinite(net_c.get_vis("scalars")["scalars"]["loss_all"])


def test_export_reconstruct_roundtrip(tmp_path):
    """Serving export: serialize the recon path, reload, byte-compare."""
    from spatialalignmentnetwork_tpu.engine.export import (
        export_reconstruct, load_exported,
    )

    cfg = tiny_cfg("Rec")
    net = CSModel(cfg=cfg)
    full, aux = _batch(seed=71)
    want = np.asarray(net.reconstruct(full, aux))

    path = str(tmp_path / "recon.bin")
    blob = export_reconstruct(net, batch_shape=full.shape, path=path)
    assert os.path.getsize(path) == len(blob) > 0

    fn = load_exported(path)
    got = np.asarray(fn(jnp.asarray(full), jnp.asarray(aux)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_training_determinism():
    """Same seed + same batches -> bit-identical parameter trajectories."""
    full, aux = _batch(seed=61)
    nets = []
    for _ in range(2):
        net = CSModel(cfg=tiny_cfg("Rec"), seed=7)
        for _ in range(2):
            net.set_input(full, aux)
            net.update()
        nets.append(net)
    for name in ("net_T", "net_R"):
        for a, b in zip(
            jax.tree_util.tree_leaves(nets[0].state["params"][name]),
            jax.tree_util.tree_leaves(nets[1].state["params"][name]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_bf16_mixed_precision_step():
    """cfg.use_amp=True (bf16 compute policy) trains without NaN/Inf and
    keeps params in fp32."""
    cfg = tiny_cfg("Rec")
    cfg.use_amp = True
    net = CSModel(cfg=cfg)
    full, aux = _batch(seed=51)
    for _ in range(2):
        net.set_input(full, aux)
        net.update()
    scalars = net.get_vis("scalars")["scalars"]
    assert all(np.isfinite(v) for v in scalars.values()), scalars
    leaf = jax.tree_util.tree_leaves(net.state["params"]["net_R"])[0]
    assert leaf.dtype == jnp.float32  # params stay fp32 under bf16 compute
    net.eval()
    net.set_input(full, aux)
    assert np.isfinite(net.test())


def test_reconstruct_serving_api():
    cfg = tiny_cfg("Rec")
    net = CSModel(cfg=cfg)
    full, aux = _batch(seed=41)
    rec = net.reconstruct(full, aux)
    assert rec.shape == (4, 1, 16, 16)
    assert np.isfinite(np.asarray(rec)).all()
    # matches the test step's img_rec exactly (same eval-mode path)
    net.eval()
    net.set_input(full, aux)
    net.test()
    np.testing.assert_allclose(
        np.asarray(rec), np.asarray(net._aux["img_rec"]), rtol=1e-5, atol=1e-6
    )
    # aux-less call works (dummy zeros modality)
    rec2 = net.reconstruct(full)
    assert np.isfinite(np.asarray(rec2)).all()


def test_checkpoint_with_optimizer_state(tmp_path):
    cfg = tiny_cfg("None")
    net = CSModel(cfg=cfg)
    full, aux = _batch(seed=31)
    net.set_input(full, aux)
    net.update()  # populate AdamW moments
    path = str(tmp_path / "ckpt_opt.pt")
    net.save(path, with_opt=True)
    assert os.path.exists(os.path.join(path, "opt_state"))

    net2 = CSModel(ckpt=path)
    from flax import serialization

    a = serialization.to_state_dict(net.state["opt"])
    b = serialization.to_state_dict(net2.state["opt"])
    from spatialalignmentnetwork_tpu.engine.checkpoint import flatten_tree

    fa, fb = flatten_tree(a), flatten_tree(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))

    # without with_opt the moments restart (reference behavior)
    path2 = str(tmp_path / "ckpt_plain.pt")
    net.save(path2)
    net3 = CSModel(ckpt=path2)
    f3 = flatten_tree(serialization.to_state_dict(net3.state["opt"]))
    diff = sum(
        float(np.abs(np.asarray(f3[k]) - np.asarray(fa[k])).sum())
        for k in fa
        if "net_R" in k and ("mu" in k or "nu" in k)
    )
    assert diff > 0


def test_checkpoint_overwrite_on_resume(tmp_path):
    """Re-saving to an existing checkpoint path overwrites (resume can
    revisit periodic checkpoint names); non-directory collisions refuse."""
    cfg = tiny_cfg("None")
    net = CSModel(cfg=cfg)
    path = str(tmp_path / "ckpt.pt")
    net.save(path)
    full, aux = _batch(seed=91)
    net.set_input(full, aux)
    net.update()
    net.save(path)  # must not raise
    net2 = CSModel(ckpt=path)
    for a, b in zip(
        jax.tree_util.tree_leaves(net.state["params"]["net_R"]),
        jax.tree_util.tree_leaves(net2.state["params"]["net_R"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bad = str(tmp_path / "afile")
    open(bad, "w").write("x")
    with pytest.raises(AssertionError):
        net.save(bad)


def test_test_step_metrics(tmp_path):
    cfg = tiny_cfg("Rec")
    net = CSModel(cfg=cfg)
    full, aux = _batch(seed=9)
    net.eval()
    net.set_input(full, aux)
    ret = net.test()
    scalars = net.get_vis("scalars")["scalars"]
    assert "metric_PSNR" in scalars and "metric_SSIM" in scalars
    assert ret == -scalars["metric_PSNR"]
    imgs = net.get_vis("images")["images"]
    assert "img_rec" in imgs and imgs["img_rec"].shape == (4, 1, 16, 16)


def test_bucketed_eval_matches_unpadded_and_shares_compiles():
    """Bucketed (padded+masked) eval: scalars equal the unpadded step, and
    volumes with different slice counts padded to one bucket share ONE
    compiled test step (VERDICT weak #5)."""
    from spatialalignmentnetwork_tpu.engine.eval import _bucket_pad

    cfg = tiny_cfg("Mixed")
    net = CSModel(cfg=cfg)
    net.eval()

    # reference scalars: unpadded whole-volume step per slice count
    want = {}
    for s, seed in ((3, 1), (5, 2)):
        full, aux = _batch(n=s, seed=seed)
        net.set_input(full, aux)
        net.test()
        want[s] = net.get_vis("scalars")["scalars"]

    net2 = CSModel(cfg=cfg)  # same seed -> same weights
    net2.eval()
    got = {}
    for s, seed in ((3, 1), (5, 2)):
        full, aux = _batch(n=s, seed=seed)
        padded, valid, restore = _bucket_pad([full, aux], bucket=8)
        assert padded[0].shape[0] == 8
        assert valid.sum() == s
        net2.set_input(*padded)
        net2.test(valid=valid)
        got[s] = net2.get_vis("scalars")["scalars"]
        # restore indices recover the original slices exactly
        np.testing.assert_array_equal(padded[0][restore], full)

    for s in (3, 5):
        for k, v in want[s].items():
            if np.isfinite(v):
                assert abs(got[s][k] - v) < 2e-3 * max(1.0, abs(v)), (
                    s, k, v, got[s][k])
    # both volumes (3 and 5 slices -> both bucket 8) used one compiled step
    test_keys = [k for k in net2._step_cache if k[0] == "test"]
    assert len(test_keys) == 1, test_keys


def test_ckpt_save_is_atomic(tmp_path, monkeypatch):
    """A failure mid-save must leave the previous checkpoint intact (the
    old rmtree-first behavior destroyed the only best.pt and left a
    partial dir that mtime-based resume would load)."""
    import numpy as np
    from spatialalignmentnetwork_tpu.engine import checkpoint as CK
    from spatialalignmentnetwork_tpu.engine.config import Config

    cfg = Config()
    cfg.marker = "v1"
    folder = str(tmp_path / "best.pt")
    CK.ckpt_save({"net_X": {"w": np.ones(3)}, "config": cfg}, folder)

    real_savez = np.savez

    def boom(*a, **kw):
        raise OSError("disk full (simulated)")

    monkeypatch.setattr(np, "savez", boom)
    cfg2 = Config()
    cfg2.marker = "v2"
    with pytest.raises(OSError):
        CK.ckpt_save({"net_X": {"w": np.zeros(3)}, "config": cfg2}, folder)
    monkeypatch.setattr(np, "savez", real_savez)

    # the original checkpoint survives and still loads
    loaded = CK.ckpt_load(folder)
    np.testing.assert_array_equal(loaded["net_X"]["w"], np.ones(3))
    assert loaded["config"].marker == "v1"


def test_perf_lever_parsing():
    """on/off/auto lever strings parse by meaning, not python truthiness
    (bool('off') is True — would silently enable a disabled lever)."""
    from spatialalignmentnetwork_tpu.engine.csmodel import (
        _parse_bool_lever,
        _parse_level_lever,
    )

    assert _parse_bool_lever("t", "off", auto=True) is False
    assert _parse_bool_lever("t", "0", auto=True) is False
    assert _parse_bool_lever("t", "False", auto=True) is False
    assert _parse_bool_lever("t", "on", auto=False) is True
    assert _parse_bool_lever("t", "auto", auto=False) is False
    assert _parse_bool_lever("t", True, auto=False) is True
    with pytest.raises(ValueError):
        _parse_bool_lever("t", "maybe", auto=False)

    assert _parse_level_lever("t", "2", auto=0) == 2
    assert _parse_level_lever("t", 3, auto=0) == 3
    assert _parse_level_lever("t", "on", auto=0) == 1
    assert _parse_level_lever("t", "off", auto=1) == 0
    assert _parse_level_lever("t", "auto", auto=0) == 0
    with pytest.raises(ValueError):
        _parse_level_lever("t", "deep", auto=0)


def test_trace_time_env_levers_are_strict(monkeypatch):
    """SAN_TPU_IN / SAN_TPU_PAIRCONV parse strictly like the cfg levers:
    a typo'd value raises instead of silently picking a path (ADVICE r3)."""
    from spatialalignmentnetwork_tpu.models import layers, unet

    monkeypatch.setattr(layers, "_IN_ONE_PASS", None)
    monkeypatch.setattr(unet, "_PAIR_DECODER", None)

    monkeypatch.setenv("SAN_TPU_IN", "onepass")
    assert layers.in_one_pass() is True
    monkeypatch.setenv("SAN_TPU_IN", "twopass")
    assert layers.in_one_pass() is False
    monkeypatch.setenv("SAN_TPU_IN", "ONEPASS")
    assert layers.in_one_pass() is True
    monkeypatch.setenv("SAN_TPU_IN", "on")  # not a valid mode name
    with pytest.raises(ValueError):
        layers.in_one_pass()

    monkeypatch.setenv("SAN_TPU_PAIRCONV", "on")
    assert unet.pair_decoder() is True
    monkeypatch.setenv("SAN_TPU_PAIRCONV", "off")
    assert unet.pair_decoder() is False
    monkeypatch.setenv("SAN_TPU_PAIRCONV", "maybe")
    with pytest.raises(ValueError):
        unet.pair_decoder()


def test_interrupted_repack_recovers_on_load(tmp_path):
    """A crash between os.remove(src) and os.replace in the single-file
    re-pack CLI leaves only NAME.repack; ckpt_load finishes the rename."""
    from spatialalignmentnetwork_tpu.engine import checkpoint as CK
    from spatialalignmentnetwork_tpu.engine.config import Config

    cfg = Config()
    cfg.lr = 1e-4
    target = str(tmp_path / "best.pt")
    CK.ckpt_save({"net_X": {"w": np.arange(3.0)}, "config": cfg},
                 target + ".repack")
    assert not os.path.exists(target)

    ckpt = CK.ckpt_load(target)
    assert os.path.isdir(target) and not os.path.exists(target + ".repack")
    np.testing.assert_array_equal(ckpt["net_X"]["w"], np.arange(3.0))


def test_remat_tg_lever_is_value_neutral(monkeypatch):
    """SAN_TPU_REMAT_TG=on (checkpoint the net_T/net_G training forwards;
    auto-enabled at global batch >= 24 to fit b32 Mixed in HBM) is a
    scheduling choice only: a full Mixed step must land on the same
    params/stats as the default no-remat path, since the rematerialized
    forward recomputes the very values the saved one produced."""
    full, aux = _batch()

    def one_step(lever):
        if lever is None:
            monkeypatch.delenv("SAN_TPU_REMAT_TG", raising=False)
        else:
            monkeypatch.setenv("SAN_TPU_REMAT_TG", lever)
        net = CSModel(cfg=tiny_cfg("Mixed"), seed=11)
        net.set_input(full, aux)
        net.update()
        return jax.tree_util.tree_map(np.asarray, net.state["params"])

    p_off = one_step(None)   # batch 4 < 24: auto resolves to off
    p_on = one_step("on")
    for a, b in zip(jax.tree_util.tree_leaves(p_off),
                    jax.tree_util.tree_leaves(p_on)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    # strict lever parsing: a typo errors at trace time rather than
    # silently picking a policy
    monkeypatch.setenv("SAN_TPU_REMAT_TG", "onn")
    net = CSModel(cfg=tiny_cfg("Mixed"), seed=11)
    net.set_input(full, aux)
    with pytest.raises(ValueError, match="SAN_TPU_REMAT_TG"):
        net.update()


def test_s2d_train_layout_matches_plain_step():
    """The round-5 train-path s2d default (csmodel.build s2d_train):
    a Mixed step through the s2d net_R layout must produce the same
    losses and near-identical updated params as the plain layout — the
    two are the SAME function of the SAME parameter tree, re-tiled
    (models/s2d.py; f64-exact equivalence in tests/test_s2d.py)."""
    full, aux = _batch()

    def run(s2d_train):
        cfg = tiny_cfg("Mixed")
        cfg.net_R_s2d_train = s2d_train
        net = CSModel(cfg=cfg, seed=3)
        net.set_input(full, aux)
        net.update()
        scal = net.get_vis("scalars")["scalars"]
        return net.state["params"], scal

    p_plain, s_plain = run(0)
    p_s2d, s_s2d = run(1)
    # the s2d module must actually differ (lever plumbed, not ignored)
    assert CSModel(cfg=tiny_cfg("Mixed")).net_R_train is not None
    for k in ("loss_all", "loss_sim", "loss_gan_sim"):
        assert np.isfinite(s_s2d[k])
        np.testing.assert_allclose(s_s2d[k], s_plain[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(p_s2d),
                    jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-3, atol=5e-5)


def test_s2d_train_default_follows_amp():
    """auto: s2d_train=1 at use_amp (bf16 perf path), 0 at f32 (the
    exactness path keeps the reference op order)."""
    cfg = tiny_cfg("Rec")
    assert CSModel(cfg=cfg).net_R_train.s2d_levels == 0
    cfg2 = tiny_cfg("Rec")
    cfg2.use_amp = True
    assert CSModel(cfg=cfg2).net_R_train.s2d_levels == 1
