"""Loss/metric oracle tests: our jnp losses vs the reference torch modules.

Imports /root/reference/{ssimloss,lnccloss,miloss,gan,model,metrics}.py as
TEST ORACLES (the established pattern, tests/test_torch_parity.py) and
compares values numerically on shared random inputs. Complements
tests/test_losses.py, which checks against inline re-derivations — here the
oracle is the reference's own executable code.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not mounted", allow_module_level=True)
# APPEND (not insert(0)): the reference dir holds generically-named
# modules (model, masks, train, eval, ...); putting it FIRST on sys.path
# would shadow real modules for the whole pytest process. Appended, real
# modules win and only names nothing else provides resolve to the oracle.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")
import ssimloss as ref_ssim  # noqa: E402
import lnccloss as ref_lncc  # noqa: E402
import miloss as ref_mi      # noqa: E402
import gan as ref_gan        # noqa: E402

from spatialalignmentnetwork_tpu.ops.ssim import ssimloss  # noqa: E402
from spatialalignmentnetwork_tpu.ops.lncc import lncc_loss, ms_lncc_loss  # noqa: E402
from spatialalignmentnetwork_tpu.ops.mi import mi_loss, ms_mi_loss  # noqa: E402
from spatialalignmentnetwork_tpu.models.gan import loss_gan  # noqa: E402


def _pair(seed=0, n=2, c=1, h=48, w=48, correlated=True):
    rng = np.random.default_rng(seed)
    x = rng.random((n, c, h, w)).astype(np.float32)
    if correlated:
        y = np.clip(
            0.7 * x + 0.3 * rng.random((n, c, h, w)).astype(np.float32), 0, 1
        )
    else:
        y = rng.random((n, c, h, w)).astype(np.float32)
    return x, y


def test_ssimloss_matches_reference_module():
    x, y = _pair(1)
    want = float(ref_ssim.ssimloss(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(ssimloss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lncc_loss_matches_reference_module():
    x, y = _pair(2)
    want = float(ref_lncc.lncc_loss(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(lncc_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_lncc_loss_matches_reference_module():
    x, y = _pair(3)
    want = float(
        ref_lncc.ms_lncc_loss(torch.from_numpy(x), torch.from_numpy(y))
    )
    got = float(ms_lncc_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mi_loss_matches_reference_module():
    x, y = _pair(4)
    want = float(ref_mi.mi_loss(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(mi_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ms_mi_loss_matches_reference_module():
    x, y = _pair(5)
    want = float(
        ref_mi.ms_mi_loss(torch.from_numpy(x), torch.from_numpy(y))
    )
    got = float(ms_mi_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gan_hinge_loss_matches_reference_module():
    rng = np.random.default_rng(6)
    pred = rng.standard_normal((4, 1, 8, 8)).astype(np.float32) * 2
    t = torch.from_numpy(pred)
    j = jnp.asarray(pred)
    # (real=True, D_loss=False) is asserted out by the reference
    for real, d_loss in ((True, True), (False, True), (False, False)):
        want = float(ref_gan.loss_gan(t, real=real, D_loss=d_loss))
        got = float(loss_gan(j, real=real, D_loss=d_loss))
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-6,
            err_msg=f"real={real} D_loss={d_loss}",
        )


def test_gradient_smooth_loss_matches_reference_module():
    # reference model.py:21-28 gradient_loss on the displacement field;
    # model.py imports metrics -> skimage, so stub it first (mask-oracle
    # pattern)
    from tests.test_mask_oracle import ref_masks  # ensures sys.path set

    try:
        import model as ref_model
    except ImportError:
        import types

        from spatialalignmentnetwork_tpu.utils import metrics as M

        sk = types.ModuleType("skimage")
        met = types.ModuleType("skimage.metrics")
        met.peak_signal_noise_ratio = lambda g, p, data_range=1.0: np.float64(
            M.psnr(g, p, data_range)
        )
        met.structural_similarity = lambda x, y, data_range=1.0: np.float64(
            M._ssim_2d(np.asarray(x), np.asarray(y), data_range)
        )
        sk.metrics = met
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = met
        import model as ref_model

    from spatialalignmentnetwork_tpu.models.stn import gradient_loss

    rng = np.random.default_rng(7)
    s = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    want = float(ref_model.gradient_loss(torch.from_numpy(s)))
    got = float(gradient_loss(jnp.asarray(s)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
