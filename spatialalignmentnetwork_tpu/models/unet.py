"""fastMRI-style U-Net and its complex-input Norm wrapper.

TPU-native re-implementation of the recon backbone family (reference
varnet.py:24-332): a 4-level encoder/decoder with avg-pool downsampling,
transpose-conv upsampling and concat skips, plus `NormUnet` which adapts it
to complex [N, C, H, W] inputs via real/imag channel stacking, two-group
normalization, pad-to-multiple-of-16 and an optional instance-normalized
reference-image channel (the spatial-alignment injection point,
varnet.py:315-319).

Modules run NHWC internally; `NormUnet` accepts the framework's NCHW complex
convention at its boundary.
"""

import os
from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    ConvBlock,
    TransposeConvBlock,
    avg_pool2,
    instance_norm,
    nchw_to_nhwc,
    nhwc_to_nchw,
)


# Decoder skip joins as PairConv (kernel-sliced sum of two convs) instead
# of a materialized jnp.concatenate — default ON: together with the
# one-pass instance norm it took serving from 369 -> 504 slices/s at b128
# on the v5e (docs/perf_ab_r03.jsonl; +13% on top of the IN win alone).
# Exact reassociation; identical param tree either way.
# SAN_TPU_PAIRCONV=0 reverts to the materialized concat. None = read the
# env at trace time; tests/tools may pin the module attribute directly.
_PAIR_DECODER = None


def pair_decoder() -> bool:
    if _PAIR_DECODER is not None:
        return _PAIR_DECODER
    v = os.environ.get("SAN_TPU_PAIRCONV", "1").strip().lower()
    # Strict like the other SAN_TPU_* levers (engine/csmodel.py
    # _parse_bool_lever): a typo must error, not silently pick a path.
    if v in ("1", "on", "true", "yes"):
        return True
    if v in ("0", "off", "false", "no", ""):
        return False
    raise ValueError(
        f"SAN_TPU_PAIRCONV: expected an on/off value, got {v!r}"
    )


class Unet(nn.Module):
    """U-Net over real NHWC arrays (reference varnet.py:24-119).

    Encoder: ConvBlock then 2x2 avg-pool per level; bottleneck ConvBlock;
    decoder: TransposeConvBlock, reflect-pad to odd sizes, concat skip,
    ConvBlock; final 1x1 conv.

    `s2d_levels=k` executes the k SHALLOWEST levels in the space-to-depth
    layout (models/s2d.py): exactly the same parameters and math, but the
    small-channel convs at the largest spatial extents run as 2x2-cell
    convs with 4x channels for MXU lane efficiency. A level falls back to
    the plain layout when its entering spatial size is odd (never the
    case downstream of NormUnet's pad-to-16).
    """

    out_chans: int
    chans: int = 32
    num_pool_layers: int = 4
    s2d_levels: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .s2d import (
            Conv as S2DConv,
            depth_to_space,
            phase_mean_pool,
            space_to_depth,
        )

        stack = []
        ch = self.chans
        # down-sampling path
        chs = [ch * (2**i) for i in range(self.num_pool_layers)]
        lvl_s2d = []
        for lvl, c in enumerate(chs):
            use = (
                lvl < self.s2d_levels
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            )
            lvl_s2d.append(use)
            if use:
                x = space_to_depth(x)
            x = ConvBlock(c, dtype=self.dtype, s2d=use)(x)
            stack.append(x)
            # phase-mean on the s2d layout IS the 2x2 avg-pool, and lands
            # back in the original layout at the pooled resolution
            x = phase_mean_pool(x) if use else avg_pool2(x)
        x = ConvBlock(chs[-1] * 2, dtype=self.dtype)(x)
        # up-sampling path
        for i, c in enumerate(reversed(chs)):
            lvl = len(chs) - 1 - i
            skip = stack.pop()
            use = lvl_s2d[lvl]
            x = TransposeConvBlock(c, dtype=self.dtype, s2d_out=use)(x)
            if use:
                # sizes are exact on s2d levels (even by construction):
                # no reflect-pad branch. BLOCK concat (cheap, contiguous);
                # the phase interleave is absorbed into the next conv's
                # kernel row permutation (s2d_in_splits)
                x = jnp.concatenate([x, skip], axis=-1)
            else:
                # reflect-pad right/bottom when the skip had an odd size
                pad_w = skip.shape[2] - x.shape[2]
                pad_h = skip.shape[1] - x.shape[1]
                if pad_w or pad_h:
                    x = jnp.pad(
                        x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect",
                    )
                # concat-free skip join: the widest tensors in the net are
                # the decoder concats at full spatial extent; PairConv
                # slices the KERNEL instead of materializing the concat
                # (exact reassociation, identical params)
                x = (x, skip) if pair_decoder() else jnp.concatenate(
                    [x, skip], axis=-1
                )
            x = ConvBlock(
                c, dtype=self.dtype, s2d=use,
                s2d_in_splits=(c, c) if use else (),
            )(x)
            if use and lvl > 0:
                # the shallower decoder level expects the original layout
                x = depth_to_space(x)
        if lvl_s2d and lvl_s2d[0]:
            x = S2DConv(self.out_chans, (1, 1), dtype=self.dtype, s2d=True)(x)
            x = depth_to_space(x)
        else:
            x = nn.Conv(self.out_chans, (1, 1), dtype=self.dtype)(x)
        return x


def _mean_var(g: jnp.ndarray, axis, n: int):
    """Group mean and UNBIASED variance (matches torch.std), f32+ stats.

    Deliberately TWO-PASS (centered), unlike the post-conv instance norms:
    the group norms run on raw image-domain inputs, where a near-flat
    plane can have mean/std large enough that the one-pass E[x^2]-mean^2
    form cancels every variance bit in f32 (std collapses to 0 and the
    normalize blows up by ~1/eps). The group norms are ~2.5% of serving
    traffic, so the one-pass read saving is noise here anyway."""
    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
    mean = jnp.mean(gf, axis=axis)
    var = jnp.var(gf, axis=axis) * (n / (n - 1))
    return mean, var


def group_norm_2(x_nchw: jnp.ndarray, eps: float = 1e-6):
    """Normalize an [N, C, H, W] real array in two groups (first/second half
    of channels = real/imag parts), with unbiased std (varnet.py:257-268).

    Returns (normalized, mean [N,2,1,1], std [N,2,1,1]).
    """
    b, c, h, w = x_nchw.shape
    g = x_nchw.reshape(b, 2, (c // 2) * h * w)
    n = g.shape[2]
    mean, var = _mean_var(g, 2, n)
    # zero-variance groups (all-constant input planes) get std=0 with a
    # ZERO gradient — sqrt's infinite slope at 0 would otherwise NaN the
    # backward pass (see ops/fft.rss note)
    nz = var > 0
    std = jnp.where(nz, jnp.sqrt(jnp.where(nz, var, 1.0)), 0.0)
    # stats accumulate in f32+ but are applied in the compute dtype: the
    # normalized activation must not silently promote under bf16 policy
    mean = mean.astype(x_nchw.dtype).reshape(b, 2, 1, 1)
    std = std.astype(x_nchw.dtype).reshape(b, 2, 1, 1)
    xn = (x_nchw.reshape(b, 2, c // 2, h, w) - mean[:, :, None]) / (
        std[:, :, None] + eps
    )
    return xn.reshape(b, c, h, w), mean, std


def group_norm_2_nhwc(x: jnp.ndarray, eps: float = 1e-6):
    """group_norm_2 for the planar-NHWC layout [N, H, W, 2C] (channels =
    [re..., im...]). Identical statistics — each group is one half of the
    channels over all spatial positions, unbiased std — without the NCHW
    reshape round trip. Returns (normalized, mean [N,2], std [N,2])."""
    n, h, w, k2 = x.shape
    c = k2 // 2
    g = x.reshape(n, h, w, 2, c)
    cnt = h * w * c
    mean, var = _mean_var(g, (1, 2, 4), cnt)
    nz = var > 0
    std = jnp.where(nz, jnp.sqrt(jnp.where(nz, var, 1.0)), 0.0)
    mean = mean.astype(x.dtype)
    std = std.astype(x.dtype)
    xn = (g - mean[:, None, None, :, None]) / (
        std[:, None, None, :, None] + eps
    )
    return xn.reshape(n, h, w, k2), mean, std


def pad_to_16_nhwc(x_nhwc: jnp.ndarray):
    """Center-pad the NHWC spatial axes (1, 2) to multiples of 16."""
    _, h, w, _ = x_nhwc.shape
    w_mult = ((w - 1) | 15) + 1
    h_mult = ((h - 1) | 15) + 1
    w_pad = ((w_mult - w) // 2, (w_mult - w) - (w_mult - w) // 2)
    h_pad = ((h_mult - h) // 2, (h_mult - h) - (h_mult - h) // 2)
    x = jnp.pad(x_nhwc, ((0, 0), h_pad, w_pad, (0, 0)))
    return x, (h_pad, w_pad, h_mult, w_mult)


def unpad_16_nhwc(x_nhwc, h_pad, w_pad, h_mult, w_mult):
    return x_nhwc[
        :, h_pad[0]: h_mult - h_pad[1], w_pad[0]: w_mult - w_pad[1], :
    ]


def pad_to_16(x_nchw: jnp.ndarray):
    """Center-pad H and W up to the next multiple of 16 (varnet.py:275-289)."""
    _, _, h, w = x_nchw.shape
    w_mult = ((w - 1) | 15) + 1
    h_mult = ((h - 1) | 15) + 1
    w_pad = ((w_mult - w) // 2, (w_mult - w) - (w_mult - w) // 2)
    h_pad = ((h_mult - h) // 2, (h_mult - h) - (h_mult - h) // 2)
    x = jnp.pad(x_nchw, ((0, 0), (0, 0), h_pad, w_pad))
    return x, (h_pad, w_pad, h_mult, w_mult)


def unpad_16(x_nchw, h_pad, w_pad, h_mult, w_mult):
    return x_nchw[..., h_pad[0] : h_mult - h_pad[1], w_pad[0] : w_mult - w_pad[1]]


class NormUnet(nn.Module):
    """U-Net wrapper for complex NCHW input (reference varnet.py:200-332).

    complex -> [real; imag] channels -> 2-group norm -> pad to /16 ->
    (optional ref channel, instance-normalized) -> Unet -> unpad -> unnorm ->
    complex.
    """

    chans: int
    num_pools: int
    in_chans: int = 1
    out_chans: int = 1
    use_ref: bool = False
    # ref arrives already instance-normalized AND padded-to-16 (both are
    # shape-only-dependent, so a caller invoking this module repeatedly on
    # the same ref — e.g. the VarNet cascade scan — hoists them out)
    ref_prenormalized: bool = False
    # execute the k shallowest U-Net levels in the space-to-depth layout
    # (models/s2d.py; parameter-identical, MXU lane efficiency)
    s2d_levels: int = 0
    dtype: Any = jnp.float32

    # planar=True switches the module to the planar-NHWC layout: __call__
    # takes/returns REAL [N, H, W, 2*chans] pairs (channels [re..., im...])
    # and the ref as NHWC [N, H, W, 1]. Same parameters, same math — the
    # complex pack/unpack and both NCHW<->NHWC transposes disappear from
    # the per-cascade hot path (the Unet is NHWC-native anyway).
    planar: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, ref: Optional[jnp.ndarray] = None):
        if self.planar:
            return self._planar_forward(x, ref)
        assert x.ndim == 4 and jnp.iscomplexobj(x)
        assert x.shape[1] == self.in_chans

        x = jnp.concatenate([x.real, x.imag], axis=1)  # [N, 2*in, H, W]
        x, mean, std = group_norm_2(x)
        x, pad_sizes = pad_to_16(x)

        if self.use_ref:
            assert ref is not None and not jnp.iscomplexobj(ref)
            if not self.ref_prenormalized:
                # raw RSS magnitude (not a post-conv activation): a near-
                # flat plane can cancel all variance bits in one-pass form
                ref = nhwc_to_nchw(
                    instance_norm(nchw_to_nhwc(ref), one_pass=False)
                )
                ref, _ = pad_to_16(ref)
            x = jnp.concatenate([x, ref], axis=1)
        else:
            assert ref is None

        x = nhwc_to_nchw(
            Unet(
                out_chans=self.out_chans * 2,
                chans=self.chans,
                num_pool_layers=self.num_pools,
                s2d_levels=self.s2d_levels,
                dtype=self.dtype,
            )(nchw_to_nhwc(x))
        )

        x = unpad_16(x, *pad_sizes)
        # unnorm with the 2-group stats
        b, c, h, w = x.shape
        x = x.reshape(b, 2, c // 2, h, w) * std[:, :, None] + mean[:, :, None]
        x = x.reshape(b, c, h, w)
        c = c // 2
        out = x[:, :c] + 1j * x[:, c:]
        assert out.shape[1] == self.out_chans
        return out

    def _planar_forward(self, x, ref):
        assert x.ndim == 4 and not jnp.iscomplexobj(x)
        assert x.shape[-1] == 2 * self.in_chans

        x, mean, std = group_norm_2_nhwc(x)
        x, pad_sizes = pad_to_16_nhwc(x)

        if self.use_ref:
            assert ref is not None and ref.shape[-1] == 1
            if not self.ref_prenormalized:
                ref = instance_norm(ref, one_pass=False)  # raw RSS magnitude
                ref, _ = pad_to_16_nhwc(ref)
            x = jnp.concatenate([x, ref], axis=-1)
        else:
            assert ref is None

        x = Unet(
            out_chans=self.out_chans * 2,
            chans=self.chans,
            num_pool_layers=self.num_pools,
            s2d_levels=self.s2d_levels,
            dtype=self.dtype,
        )(x)

        x = unpad_16_nhwc(x, *pad_sizes)
        n, h, w, k2 = x.shape
        x = x.reshape(n, h, w, 2, k2 // 2) * std[:, None, None, :, None] + (
            mean[:, None, None, :, None]
        )
        return x.reshape(n, h, w, k2)
