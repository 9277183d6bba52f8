"""Learning sanity: the jitted Rec train step genuinely optimizes.

Guards against silent gradient breakage (stop_gradient misplacement, stale
params, optimizer wiring) that shape/grad unit tests cannot catch: on a
structured synthetic task the recon loss must fall substantially within a
modest number of steps (measured headroom: ~34% over 120 steps).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_engine import tiny_cfg
from spatialalignmentnetwork_tpu.engine.csmodel import CSModel
from spatialalignmentnetwork_tpu.data.augment import augment


def test_rec_regime_learns():
    rng = np.random.default_rng(0)
    base = rng.random((8, 1, 16, 16)).astype(np.float32)
    for _ in range(3):  # smooth "anatomy"
        base = (base + np.roll(base, 1, -1) + np.roll(base, 1, -2)) / 3
    base = base / base.max()
    full = base.astype(np.complex64)
    aux = (base**2 / np.max(base**2)).astype(np.complex64)
    aux_w, _ = augment(jnp.asarray(aux), jax.random.PRNGKey(0))
    aux_w = np.asarray(aux_w)

    net = CSModel(cfg=tiny_cfg("Rec"), seed=1)
    losses = []
    for _ in range(80):
        net.set_input(full, aux_w)
        net.update()
        losses.append(float(net._aux["loss_sim"]))
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert last < first * 0.85, (first, last)
