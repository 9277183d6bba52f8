"""Multi-coil raw k-space support (BASELINE config[4])."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_engine import tiny_cfg
from spatialalignmentnetwork_tpu.engine.csmodel import CSModel
from spatialalignmentnetwork_tpu.models.varnet import VarNet


def _randc(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


@pytest.mark.slow
def test_varnet_multicoil_forward_and_grad():
    coils = 4
    net = VarNet(num_cascades=1, sens_chans=2, sens_pools=1, chans=4, pools=1,
                 use_ref=True)
    k = jnp.asarray(_randc((2, coils, 16, 16), 0))
    mask = jnp.asarray(np.random.default_rng(1).random(16) > 0.5)
    ref = jnp.abs(jnp.asarray(_randc((2, coils, 16, 16), 2)))
    params = net.init(jax.random.PRNGKey(0), k, mask, ref, 4)
    out = net.apply(params, k, mask, ref, 4)
    # rss collapses coils to a single channel
    assert out.shape == (2, 1, 16, 16)
    g = jax.grad(lambda p: jnp.sum(net.apply(p, k, mask, ref, 4) ** 2))(params)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(l).all() for l in leaves)
    # non-zero, not just finite: a stop-gradient regression in the
    # multicoil path (e.g. a detached sens map) would zero every leaf and
    # still be 'finite' (the single-coil test asserts the same)
    gsum = sum(float(np.abs(l).sum()) for l in leaves)
    assert gsum > 0.0, "all multicoil gradients are zero"


@pytest.mark.slow
def test_csmodel_multicoil_rec_step():
    cfg = tiny_cfg("Rec")
    cfg.coils = 2
    net = CSModel(cfg=cfg)
    full = jnp.asarray(_randc((2, 2, 16, 16), 3))
    aux = jnp.asarray(_randc((2, 2, 16, 16), 4))
    net.set_input(full, aux)
    net.update()
    scalars = net.get_vis("scalars")["scalars"]
    assert np.isfinite(scalars["loss_all"])
    net.eval()
    net.set_input(full, aux)
    ret = net.test()
    assert np.isfinite(ret)
    assert net._aux["img_rec"].shape == (2, 1, 16, 16)
    assert net._aux["img_warped"].shape == (2, 2, 16, 16)
