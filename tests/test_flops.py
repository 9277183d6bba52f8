"""Validate the analytic FLOP counters (utils/flops.py) against XLA.

The train-MFU in `bench.py --mode train` is only as honest as
train_step_flops, so every per-net forward counter is checked against
XLA's cost_analysis of the real module (within a tolerance that covers
border effects: the analytic count bills 'SAME' convs at full kernel
cost everywhere while XLA subtracts the zero-padding MACs — a few
percent at these sizes). The 3x backward multiplier is checked by
differentiating a real net. cost_analysis is trustworthy here because
none of these nets contain a scan (the known while-body undercount
documented in utils/flops.py applies to VarNet only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialalignmentnetwork_tpu.utils.flops import (
    libunet_flops,
    netd_flops,
    netg_flops,
    stn_flops,
    train_step_flops,
    varnet_flops,
)


def _xla_flops(fn, *args):
    analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis["flops"])


def _rel_err(analytic, measured):
    return abs(analytic - measured) / measured


SHAPE = 64  # big enough that border undercount stays within tolerance


def test_libunet_flops_matches_xla():
    from spatialalignmentnetwork_tpu.models.unet_lib import LibUNet

    layers = (32, 64, 64, 64, 64)
    net = LibUNet(out_chans=32, layers=layers)
    x = jnp.zeros((1, SHAPE, SHAPE, 2))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    analytic = libunet_flops(SHAPE, SHAPE, 2, 32, layers)
    measured = _xla_flops(
        lambda v, x: net.apply(v, x, train=False), variables, x)
    # analytic >= measured (padding-billed MACs) and close
    assert _rel_err(analytic, measured) < 0.10, (analytic, measured)


def test_netg_flops_matches_xla():
    from spatialalignmentnetwork_tpu.models.gan import NetG

    net = NetG()
    x = jnp.zeros((1, 1, SHAPE, SHAPE))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    analytic = netg_flops(SHAPE)
    measured = _xla_flops(
        lambda v, x: net.apply(v, x, train=False), variables, x)
    assert _rel_err(analytic, measured) < 0.10, (analytic, measured)


def test_netd_flops_matches_xla():
    from spatialalignmentnetwork_tpu.models.gan import NetD

    net = NetD()
    x = jnp.zeros((1, 2, SHAPE, SHAPE))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    analytic = netd_flops(SHAPE)
    measured = _xla_flops(
        lambda v, x: net.apply(v, x, train=False), variables, x)
    assert _rel_err(analytic, measured) < 0.10, (analytic, measured)


def test_stn_flops_matches_xla():
    from spatialalignmentnetwork_tpu.models.stn import SpatialTransformer

    net = SpatialTransformer()
    m = jnp.zeros((1, 1, SHAPE, SHAPE))
    variables = net.init(jax.random.PRNGKey(0), m, m, train=False)
    analytic = stn_flops(SHAPE)
    measured = _xla_flops(
        lambda v, a, b: net.apply(v, a, b, train=False), variables, m, m)
    # the warp itself (grid_sample) is excluded from the analytic count
    # as bandwidth-not-FLOPs; allow it inside the band
    assert _rel_err(analytic, measured) < 0.12, (analytic, measured)


def test_backward_multiplier_is_three():
    """The 3x fwd+bwd multiplier train_step_flops uses is measured, not
    assumed: grad-of-sum through NetD costs 3.0x its forward per XLA."""
    from spatialalignmentnetwork_tpu.models.gan import NetD

    net = NetD()
    x = jnp.zeros((1, 2, SHAPE, SHAPE))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]

    def fwd(p, x):
        return jnp.sum(net.apply(
            {"params": p, "batch_stats": stats}, x, train=False))

    f_fwd = _xla_flops(fwd, params, x)
    f_bwd = _xla_flops(jax.grad(fwd), params, x)
    assert 2.6 < f_bwd / f_fwd < 3.3, f_bwd / f_fwd


def test_inventory_matches_counters():
    """The GEMM inventory (utils/flops.py *_convs, the SOL model's input)
    must sum to the scalar counters bit-for-bit — one recursion, two
    renderings."""
    from spatialalignmentnetwork_tpu.utils.flops import (
        libunet_convs,
        netd_convs,
        netg_convs,
        stn_convs,
        unet_convs,
        varnet_convs,
        varnet_flops_parts,
        unet_flops,
    )

    def tot(recs):
        return sum(r["flops"] for r in recs)

    assert tot(unet_convs(320, 320, 3, 2, 18, 4)) == unet_flops(
        320, 320, 3, 2, 18, 4)
    assert tot(libunet_convs(320, 320, 2, 32)) == libunet_flops(
        320, 320, 2, 32)
    assert tot(stn_convs(320)) == stn_flops(320)
    assert tot(netg_convs(320)) == netg_flops(320)
    assert tot(netd_convs(320)) == netd_flops(320)
    for impl in ("matmul", "xla"):
        sens_r, casc_r, edge_r = varnet_convs(320, fft_impl=impl)
        sens, casc, edge = varnet_flops_parts(320, fft_impl=impl)
        assert tot(sens_r) == pytest.approx(sens, rel=1e-12)
        assert 8 * tot(casc_r) == pytest.approx(casc, rel=1e-12)
        assert tot(edge_r) == pytest.approx(edge, rel=1e-12)


def test_train_step_flops_regime_relations():
    """Structural invariants of the per-regime accounting
    (engine/csmodel.py GRAD_NETS; reference model.py:193-263)."""
    totals = {}
    nets = {}
    for reg in ("None", "Rec", "Mixed", "GAN-Only"):
        totals[reg], nets[reg] = train_step_flops(reg, 320)

    # None trains R but only forwards T
    assert nets["None"]["net_T"] * 3 == nets["Rec"]["net_T"]
    assert nets["None"]["net_R"] == nets["Rec"]["net_R"]
    assert set(nets["None"]) == {"net_T", "net_R"}
    # Mixed = Rec + the GAN pair
    assert set(nets["Mixed"]) == {"net_T", "net_R", "net_G", "net_D"}
    assert totals["Mixed"] == pytest.approx(
        totals["Rec"] + nets["Mixed"]["net_G"] + nets["Mixed"]["net_D"])
    # GAN-Only drops R
    assert "net_R" not in nets["GAN-Only"]
    # D is 8x its forward (2x G-phase dgrad + 6x D-phase fake+real)
    d_fwd = nets["Mixed"]["net_D"] / 8.0
    assert d_fwd > 0
    # remat lever: 'full' re-forwards the cascade -> strictly more FLOPs
    full, _ = train_step_flops("Rec", 320, remat="full")
    dots, _ = train_step_flops("Rec", 320, remat="dots")
    assert full > dots
    # R-train cost exceeds 3x and is below 4x the serving forward
    fwd = varnet_flops(320)
    assert 3.0 * fwd < nets["Rec"]["net_R"] < 4.0 * fwd
