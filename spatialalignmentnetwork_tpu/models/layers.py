"""Shared building blocks for the network zoo.

All conv modules operate in NHWC (the natural TPU/XLA layout); the public
model facades convert from the framework's NCHW array convention at their
boundaries. Compute dtype is configurable (bf16 on TPU for speed); parameters
stay fp32.
"""

import os
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


# One-pass instance-norm statistics (sum and sum-of-squares in a single
# read of the activation, var = E[x^2] - mean^2 in f32) vs the textbook
# two-pass form. The one-pass form reads each conv output twice instead of
# three times — a pure HBM-bandwidth lever on the serving path, where the
# UNet convs are bandwidth-bound (PERF.md "Where the time goes").
# None = read SAN_TPU_IN at trace time (so setting the env after import
# still works, like the other SAN_TPU_* levers); tests/tools may pin the
# module attribute to True/False directly.
_IN_ONE_PASS = None


def in_one_pass() -> bool:
    if _IN_ONE_PASS is not None:
        return _IN_ONE_PASS
    v = os.environ.get("SAN_TPU_IN", "onepass").strip().lower()
    if v == "onepass":
        return True
    if v == "twopass":
        return False
    # Strict like the other SAN_TPU_* levers (engine/csmodel.py
    # _parse_bool_lever): a typo must error, not silently pick a path.
    raise ValueError(
        f"SAN_TPU_IN: expected 'onepass' or 'twopass', got {v!r}"
    )


def instance_norm(
    x: jnp.ndarray, eps: float = 1e-5, one_pass: bool = None
) -> jnp.ndarray:
    """InstanceNorm without affine params over an NHWC array.

    Normalizes each (sample, channel) plane by its spatial mean/variance
    (biased variance, matching torch InstanceNorm2d defaults). Statistics
    are accumulated in f32 regardless of the compute dtype; the one-pass
    form (default, `SAN_TPU_IN=twopass` reverts) fuses the mean and
    second-moment reductions into a single pass over the activation.
    E[x^2]-mean^2 cancellation is benign for POST-CONV activations
    (mean/std ratio O(1), f32 accumulation); call sites normalizing raw
    image-domain inputs — where a near-flat plane can have mean/std large
    enough to cancel all variance bits — must pass `one_pass=False`
    (see the ref-channel norms in varnet/unet and group_norm_2).
    """
    if one_pass is None:
        one_pass = in_one_pass()
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(stat_dtype)
    if one_pass:
        cnt = x.shape[1] * x.shape[2]
        s1 = jnp.sum(xf, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(xf * xf, axis=(1, 2), keepdims=True)
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
        return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def leaky_relu(x, negative_slope=0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


class PairConv(nn.Conv):
    """nn.Conv applied to the implicit channel-concat of two arrays.

    conv(concat(a, b), W) == conv(a, W[..., :ca, :]) + conv(b, W[..., ca:, :])
    — the same multiply-accumulates reassociated, so the decoder's widest
    tensors (skip concats at full spatial extent) are never materialized:
    the concat write+read is replaced by slicing the tiny kernel. Declares
    the identical `kernel` param (name/shape/init) as nn.Conv over the
    concat, so checkpoints are layout-independent. 3x3 pad-1 no-bias only
    (the UNet ConvBlock shape).
    """

    @nn.compact
    def __call__(self, pair):
        a, b = pair
        ca = a.shape[-1]
        ci = ca + b.shape[-1]
        assert (tuple(self.kernel_size), self.use_bias) == ((3, 3), False)
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (ci, self.features), self.param_dtype,
        )
        a, b, kernel = nn.dtypes.promote_dtype(a, b, kernel, dtype=self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        ya = jax.lax.conv_general_dilated(
            a, kernel[:, :, :ca, :], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
        yb = jax.lax.conv_general_dilated(
            b, kernel[:, :, ca:, :], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
        return ya + yb


class ConvBlock(nn.Module):
    """Two (conv3x3 no-bias -> InstanceNorm -> LeakyReLU(0.2)) stages.

    fastMRI UNet basic block (reference varnet.py:122-156).

    With `s2d=True` the block consumes/produces the space-to-depth layout
    (models/s2d.py): same parameters, same math, executed as 2x2-cell
    convs with 4x channels for MXU lane efficiency. The param path is
    unchanged (the s2d `Conv` subclass is deliberately named `Conv`).
    """

    out_chans: int
    dtype: Dtype = jnp.float32
    s2d: bool = False
    # block layout of the s2d input to the FIRST conv (kernel-side
    # interleave absorption; see s2d.conv3x3_s2d in_splits)
    s2d_in_splits: tuple = ()

    @nn.compact
    def __call__(self, x):
        from .s2d import Conv as S2DConv, instance_norm_s2d

        for stage in range(2):
            if self.s2d:
                x = S2DConv(
                    self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, s2d=True,
                    s2d_in_splits=self.s2d_in_splits if stage == 0 else (),
                    name=f"Conv_{stage}",
                )(x)
                x = instance_norm_s2d(x)
            elif isinstance(x, tuple):
                # (a, b) standing for their channel concat — see PairConv
                x = PairConv(
                    self.out_chans, (3, 3), use_bias=False,
                    dtype=self.dtype, name=f"Conv_{stage}",
                )(x)
                x = instance_norm(x)
            else:
                x = nn.Conv(
                    self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"Conv_{stage}",
                )(x)
                x = instance_norm(x)
            x = leaky_relu(x, 0.2)
        return x


class TransposeConvBlock(nn.Module):
    """ConvTranspose 2x2 stride-2 (no bias) -> InstanceNorm -> LeakyReLU(0.2)
    (reference varnet.py:159-192).

    With `s2d_out=True` the input stays in the ORIGINAL layout (at cell
    resolution) and the output is the s2d layout at 2x resolution: the
    2x2 stride-2 transpose conv is exactly one 1x1 conv there
    (models/s2d.py), with the identical `ConvTranspose_0/kernel` param.
    """

    out_chans: int
    dtype: Dtype = jnp.float32
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x):
        from .s2d import ConvTranspose as S2DConvTranspose, instance_norm_s2d

        # The s2d path computes the 2x2 stride-2 transpose conv as ONE 1x1
        # matmul emitting the four output phases (s2d.ConvTranspose) —
        # 2.7x XLA's conv_transpose lowering in isolation on the v5e.
        # The PLAIN path stays on nn.ConvTranspose: matmul+depth_to_space
        # as the default was a 9% COMPOSITE regression (369 -> 335
        # slices/s, docs/perf_ab_r03.jsonl) — the phase re-interleave
        # breaks XLA's fusion with the surrounding norm/concat and its
        # transpose costs more than the conv it saved.
        x = S2DConvTranspose(
            self.out_chans, (2, 2), strides=(2, 2), use_bias=False,
            dtype=self.dtype, s2d_out=self.s2d_out,
        )(x)
        x = instance_norm_s2d(x) if self.s2d_out else instance_norm(x)
        x = leaky_relu(x, 0.2)
        return x


def avg_pool2(x):
    """2x2 stride-2 average pooling, NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest2(x):
    """Nearest-neighbor 2x upsample, NHWC.

    Two 4/5-D stages instead of one 6-D broadcast: the fused
    [N,H,2,W,2,C] temp tiles on TPU with minormost dims (2, C), and the
    size-2 sublane dim pads to the native sublane count (16 for bf16) —
    an 8x HBM expansion that was the largest temp in the b32 Mixed
    compile OOM (docs/perf_ab_r04.jsonl round-4 entry). Here every
    intermediate keeps large minormost dims:
      1. H-doubling: broadcast to [N,H,2,W,C] (minor dims W,C) and
         collapse — the dup axis never lands in the tiled pair.
      2. W-doubling: duplicate along channel to [N,2H,W,2C] and reshape;
         row-major (W,2C)->(2W,C) maps (w, j) to (2w + j//C, j%C), and
         both channel halves hold x, so this interleaves columns exactly.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None], (n, h, 2, w, c)).reshape(n, 2 * h, w, c)
    return jnp.concatenate([x, x], axis=-1).reshape(n, 2 * h, 2 * w, c)
