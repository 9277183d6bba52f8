"""Mask learning/pruning integration tests (Taylor saliency, magnitude)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.test_engine import tiny_cfg, _batch
from spatialalignmentnetwork_tpu.engine.csmodel import CSModel


def test_taylor_saliency_accumulate_and_prune():
    cfg = tiny_cfg("None")
    cfg.mask = "taylor"
    net = CSModel(cfg=cfg)
    assert np.asarray(net.state["pruned"]).sum() == 0  # starts unpruned
    full, aux = _batch(seed=3)
    net.set_input(full, aux)
    net.taylor_step()
    net.set_input(*_batch(seed=4))
    net.taylor_step()
    assert len(net._taylor_values) == 2
    assert net._taylor_values[0].shape == (cfg.shape,)
    assert np.isfinite(net._taylor_values[0]).all()
    net.prune(4)
    pruned = np.asarray(net.state["pruned"])
    assert pruned.sum() == 4
    assert net._taylor_values == []  # reset after prune


def test_magnitude_prune_via_model():
    cfg = tiny_cfg("None")
    cfg.mask = "mask"
    net = CSModel(cfg=cfg)
    assert "weight" in net.state["params"]["net_mask"]
    # make some weights small so they are prunable under thres=1
    w = np.ones(cfg.shape, np.float32)
    w[[1, 5, 9]] = 0.01
    net.state["params"]["net_mask"]["weight"] = jnp.asarray(w)
    net.prune(2)
    pruned = np.asarray(net.state["pruned"])
    assert pruned.sum() == 2
    assert pruned[[1, 5, 9]].sum() == 2  # smallest weights pruned


def test_loupe_learn_mask_updates_logits():
    """cfg.learn_mask routes undersampling through the differentiable
    LOUPE soft sample so the mask logits train with net_R."""
    cfg = tiny_cfg("None")
    cfg.mask = "loupe"
    cfg.learn_mask = True
    net = CSModel(cfg=cfg)
    w0 = np.asarray(net.state["params"]["net_mask"]["weight"]).copy()
    full, aux = _batch(seed=21)
    net.set_input(full, aux)
    net.update()
    w1 = np.asarray(net.state["params"]["net_mask"]["weight"])
    assert np.abs(w1 - w0).sum() > 0
    # hard mask refreshed with the target kept-line count
    kept = (~np.asarray(net.state["pruned"])).sum()
    assert kept == int(cfg.sparsity * cfg.shape + 0.5)
    # without the flag the logits stay frozen (reference live-path parity)
    cfg2 = tiny_cfg("None")
    cfg2.mask = "loupe"
    net2 = CSModel(cfg=cfg2)
    w20 = np.asarray(net2.state["params"]["net_mask"]["weight"]).copy()
    net2.set_input(full, aux)
    net2.update()
    assert np.abs(
        np.asarray(net2.state["params"]["net_mask"]["weight"]) - w20
    ).sum() == 0


def test_loupe_learn_mask_rec_regime():
    """learn_mask also trains the logits in the Rec regime (T+R+mask)."""
    cfg = tiny_cfg("Rec")
    cfg.mask = "loupe"
    cfg.learn_mask = True
    net = CSModel(cfg=cfg)
    w0 = np.asarray(net.state["params"]["net_mask"]["weight"]).copy()
    full, aux = _batch(seed=23)
    net.set_input(full, aux)
    net.update()
    w1 = np.asarray(net.state["params"]["net_mask"]["weight"])
    assert np.abs(w1 - w0).sum() > 0
    scalars = net.get_vis("scalars")["scalars"]
    assert np.isfinite(scalars["loss_all"])


def test_fixed_mask_prune_is_noop_at_default_thres():
    cfg = tiny_cfg("None")
    net = CSModel(cfg=cfg)  # equispaced: implicit all-ones weight
    before = np.asarray(net.state["pruned"]).copy()
    net.prune(2)  # thres=1, |w|=1 >= thres everywhere -> nothing pruned
    np.testing.assert_array_equal(np.asarray(net.state["pruned"]), before)
