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


def test_rescale_prob_saturated_mean_has_finite_grad():
    """jnp.where evaluates both branches: when sigmoid(w*slope) saturates
    to 1.0 in f32 the unguarded formulation divided by (1-xbar)=0 and
    NaN-poisoned the mask gradient (double-where guard regression)."""
    import jax
    import jax.numpy as jnp
    from spatialalignmentnetwork_tpu.ops import masks as M

    def loss(w):
        mask, _ = M.loupe_sample(
            w, sparsity=0.25, pmask_slope=5.0, sample_slope=10.0,
            key=jax.random.PRNGKey(0), batch=2, training=True,
        )
        return jnp.sum(mask)

    g = jax.grad(loss)(jnp.full((16,), 4.0))  # sigmoid(20) == 1.0 in f32
    assert np.all(np.isfinite(np.asarray(g))), g


def test_loupe_zero_kept_lines_raises():
    import jax
    from spatialalignmentnetwork_tpu.ops import masks as M

    with pytest.raises(ValueError, match="keeps 0 lines"):
        M.loupe_sample(
            jnp.zeros((16,)), sparsity=0.01, pmask_slope=5.0,
            sample_slope=10.0, key=jax.random.PRNGKey(0), batch=1,
            training=False,
        )


def test_gan_regime_batch_one_raises():
    """Batch 1 in Mixed/GAN-Only would push an EMPTY half-batch through
    NetG's BatchNorm (mean over 0 rows = NaN) while losses stay finite;
    the step builder must refuse loudly like the reference's torch.chunk."""
    net = CSModel(cfg=tiny_cfg("Mixed"))
    full, aux = _batch(n=1, seed=5)
    net.set_input(full, aux)
    with pytest.raises(ValueError, match="forwardG crossover"):
        net.update()


def test_taylor_prune_keeps_cached_dp_steps_valid():
    """prune() must NOT change the state pytree structure: under
    --data_parallel the cached jitted steps carry in_shardings built from
    the pre-prune tree, and a structure change (the old code grew
    params['net_mask'] by a 'weight' key) crashes the next update() with
    a prefix-pytree mismatch. The saliency diagnostic must still surface
    in get_vis('histograms')."""
    import jax
    from spatialalignmentnetwork_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg("None")
    cfg.mask = "taylor"
    net = CSModel(cfg=cfg)
    net.distribute(make_mesh(len(jax.devices())))
    full, aux = _batch(seed=5, n=8)
    net.set_input(full, aux)
    net.update()  # caches the sharded train step
    structure_before = jax.tree_util.tree_structure(net.state)
    net.set_input(*_batch(seed=6, n=8))
    net.taylor_step()
    net.prune(2)
    assert jax.tree_util.tree_structure(net.state) == structure_before
    net.set_input(*_batch(seed=7, n=8))
    net.update()  # the CACHED step must still accept the pruned state
    assert np.isfinite(net.get_vis("scalars")["scalars"]["loss_all"])
    hist = net.get_vis("histograms")["histograms"]
    assert "weights" in hist and hist["weights"]["values"].shape == (
        cfg.shape,
    )
