"""Space-to-depth (s2d) execution layout for small-channel convolutions.

The recon UNets run 3x3 convs with 18 (cascade) / 8 (sens) channels at
320x320: on the MXU those tile at ~9-14% lane efficiency (K = 9*C_in,
N = C_out, both far below the 128-lane width) and were measured as the
dominant serving cost (PERF.md "Where the time goes"). This module
re-expresses each stride-1 3x3 conv EXACTLY as a single 2x2 conv over
2x2-space-to-depth cells with 4x the channels (K = 16*C_in, N = 4*C_out),
raising lane efficiency ~3-4x for a 16/9 FLOP increase — the standard TPU
"conv0" trick (cf. the ResNet space-to-depth input transformation),
implemented here for stride-1 kernels and applied to whole UNet levels so
activations stay in the s2d layout across conv -> norm -> act -> conv.

Everything is pure XLA (reshape/transpose/conv): unlike the Pallas
space-to-depth GEMM kernel (ops/pallas/conv.py), this path rides XLA's
full-speed HBM pipeline, which matters on relay backends where Mosaic DMA
is slow (PERF.md round-2 decision 3).

Layout convention ("s2d", phase-major): a real NHWC array [N, H, W, C]
with H, W even maps to [N, H/2, W/2, 4*C] where output channel
(2p + q)*C + c holds pixel (2I+p, 2J+q, c) of cell (I, J).

Exactness: all transforms here are algebraic re-indexings of the same
multiply-accumulates; outputs match the plain path to float reassociation
(tests/test_s2d.py pins fwd+grad equivalence). Parameters are IDENTICAL
to the plain path — the `Conv`/`ConvTranspose` classes below subclass the
flax modules and declare the same `kernel` param (same name, same shape,
same init), so checkpoints are interchangeable between layouts.

Derivation (per axis): output pixel 2I+p of a 3-tap stride-1 conv needs
input pixels 2I+p-1 .. 2I+p+1, which lie in cells I-1 .. I+1 — so a
3-cell kernel with SAME padding covers every output phase in ONE conv
with no post-shift (see s2d_conv_kernel for the tap mapping and why the
minimal 2x2-cell formulation lost on measurement).
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


# ----------------------------------------------------------- layout moves
def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, 4C], phase-major channel blocks."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [N, Hc, Wc, p, q, c]
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """[N, Hc, Wc, 4C] -> [N, 2Hc, 2Wc, C] (inverse of space_to_depth)."""
    n, hc, wc, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, hc, wc, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # [N, Hc, p, Wc, q, c]
    return x.reshape(n, 2 * hc, 2 * wc, c)


# NOTE on lowering: every helper below works on PHASE BLOCKS via static
# lane slices (x[..., i*c:(i+1)*c]) instead of a [..., 4, c] reshape —
# reshaping the lane dim into (4, c) and reducing/indexing the 4 axis was
# measured at 2.2x the cost of an equivalent flat-layout pass on the v5e
# (the strided split breaks XLA's reduction tiling; PERF.md round 3).
def _phases(x: jnp.ndarray):
    c = x.shape[-1] // 4
    return [x[..., i * c:(i + 1) * c] for i in range(4)]


def concat_s2d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat two s2d arrays so the result is the s2d form of the
    plain concat (per-phase interleave, not block concat)."""
    pa, pb = _phases(a), _phases(b)
    return jnp.concatenate(
        [t for i in range(4) for t in (pa[i], pb[i])], axis=-1
    )


def phase_mean_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pooling of the underlying image, expressed on
    the s2d layout: the four phases of a cell ARE its 2x2 block, so the
    pool is a mean over phase blocks. [N,Hc,Wc,4C] -> [N,Hc,Wc,C] in the
    ORIGINAL layout (cell grid = pooled pixel grid)."""
    p = _phases(x)
    return (p[0] + p[1] + p[2] + p[3]) * 0.25


def instance_norm_s2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm (per sample, per ORIGINAL channel, over all pixels) on
    the s2d layout: the 4 phase copies of a channel share statistics.

    Mirrors models/layers.py instance_norm, including the one-pass /
    two-pass switch (SAN_TPU_IN) and f32 stat accumulation, so the s2d
    and plain layouts stay equivalent to reassociation. The phase
    reduction happens on the tiny [N, 4C] stat arrays, never on the
    activation."""
    from .layers import in_one_pass

    n, hc, wc, c4 = x.shape
    c = c4 // 4
    cnt = hc * wc * 4

    def phase_sum(s):  # [N, 4C] -> [N, C]
        return s[:, :c] + s[:, c:2 * c] + s[:, 2 * c:3 * c] + s[:, 3 * c:]

    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    if in_one_pass():
        mean = phase_sum(jnp.sum(xf, axis=(1, 2))) / cnt
        m2 = phase_sum(jnp.sum(xf * xf, axis=(1, 2))) / cnt
        var = jnp.maximum(m2 - mean * mean, 0.0)
        mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
        rstd4 = jnp.tile(jax.lax.rsqrt(var + eps), (1, 4))[:, None, None, :]
        return ((x - mean4) * rstd4).astype(x.dtype)
    mean = phase_sum(jnp.sum(xf, axis=(1, 2))) / cnt
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    d = xf - mean4
    var = phase_sum(jnp.sum(d * d, axis=(1, 2))) / cnt
    rstd4 = jnp.tile(jax.lax.rsqrt(var + eps), (1, 4))[:, None, None, :]
    return (d * rstd4).astype(x.dtype)


# ------------------------------------------------------- kernel transform
def s2d_conv_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, ci, co] stride-1 kernel -> [3, 3, 4ci, 4co] cell kernel.

    Output phase p at cell I is output pixel 2I+p; its tap di touches
    input pixel 2I+p+di = cell I+u phase r with r = (p+di) mod 2 and
    u = (p+di-r)/2 in {-1,0,1} — so a 3-cell kernel (index a = u+1)
    covers every phase with NO post-conv shift. ~44% of the cell-kernel
    entries are structurally zero (each (p, di) pair maps to exactly one
    (a, r)); the wasted MXU FLOPs are free at these shapes, while the
    phase-shift slice/concat of the minimal 2x2 formulation was measured
    at 1.5x the cost of the conv itself on the v5e (PERF.md round 3)."""
    ci, co = k3.shape[2], k3.shape[3]
    w = jnp.zeros((3, 3, 4 * ci, 4 * co), dtype=k3.dtype)
    for p in range(2):
        for q in range(2):
            for di in range(-1, 2):
                r = (p + di) % 2
                a = (p + di - r) // 2 + 1
                for dj in range(-1, 2):
                    s = (q + dj) % 2
                    b = (q + dj - s) // 2 + 1
                    w = w.at[
                        a, b,
                        (2 * r + s) * ci:(2 * r + s + 1) * ci,
                        (2 * p + q) * co:(2 * p + q + 1) * co,
                    ].set(k3[di + 1, dj + 1])
    return w


def _block_row_perm(splits):
    """Input-row permutation mapping the BLOCK layout (each source's four
    phase blocks contiguous: [a(4ca) | b(4cb) | ...]) onto the standard
    phase-major layout over the combined channels.

    perm[physical_row] = standard_row, so W_block = W_std[perm] applies a
    standard cell kernel directly to a block-concatenated activation —
    the per-phase interleave (concat_s2d) on the ACTIVATION was measured
    at 3.5 ms/pass on the v5e, while permuting the tiny kernel is free."""
    ci = sum(splits)
    perm = []
    off = 0
    for cm in splits:
        for ph in range(4):
            for c in range(cm):
                perm.append(ph * ci + off + c)
        off += cm
    return perm


def conv3x3_s2d(x: jnp.ndarray, k3: jnp.ndarray, in_splits=None) -> jnp.ndarray:
    """Stride-1 3x3 conv (zero pad 1, no bias) applied on the s2d layout.

    x: [N, Hc, Wc, 4ci], k3: [3, 3, ci, co] -> [N, Hc, Wc, 4co]; equals
    space_to_depth(conv3x3(depth_to_space(x), k3)).

    `in_splits=(ca, cb, ...)` declares that x is a BLOCK concat of several
    s2d arrays ([a(4ca) | b(4cb) | ...]) standing for the channel concat
    of their images: the layout difference is absorbed into the kernel's
    input-row permutation (see _block_row_perm)."""
    w = s2d_conv_kernel(k3)
    if in_splits is not None and len(in_splits) > 1:
        w = w[:, :, jnp.asarray(_block_row_perm(tuple(in_splits))), :]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# -------------------------------------------------------------- modules
class Conv(nn.Conv):
    """nn.Conv with an optional s2d application path.

    Subclassed (and deliberately named `Conv`) so the flax param path and
    the declared `kernel` param are bit-identical to nn.Conv — the same
    checkpoint drives either layout. s2d mode supports exactly the two
    call shapes the UNets use: 3x3 stride-1 pad-1 no-bias, and the final
    1x1 conv (with bias), both consuming/producing s2d arrays."""

    s2d: bool = False
    # block layout of the s2d input (see conv3x3_s2d in_splits)
    s2d_in_splits: tuple = ()

    @nn.compact
    def __call__(self, x):
        if not self.s2d:
            return super().__call__(x)
        ci = x.shape[-1] // 4
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (ci, self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        if tuple(self.kernel_size) == (1, 1):
            # 1x1 conv is phase-block-diagonal on the s2d layout: one
            # matmul per static phase block (no [..., 4, c] reshape)
            k = kernel[0, 0]
            y = jnp.concatenate(
                [x[..., i * ci:(i + 1) * ci] @ k for i in range(4)],
                axis=-1,
            )
            if bias is not None:
                y = y + jnp.tile(bias, 4)
            return y
        assert tuple(self.kernel_size) == (3, 3) and bias is None, (
            "s2d Conv supports 3x3/no-bias and 1x1 only"
        )
        return conv3x3_s2d(x, kernel, in_splits=self.s2d_in_splits or None)


class ConvTranspose(nn.ConvTranspose):
    """nn.ConvTranspose with an optional s2d OUTPUT path (same param path
    and `kernel` declaration as nn.ConvTranspose).

    s2d_out mode covers the UNet's 2x2 stride-2 no-bias upsampler: output
    pixel (2I+p, 2J+q) = sum_ci x[I, J, ci] k[p, q, ci, co], i.e. on the
    s2d layout the whole op is ONE 1x1 conv emitting all four phase
    blocks. Input is the ORIGINAL layout at cell resolution; output is
    s2d at 2x resolution."""

    s2d_out: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.s2d_out:
            return super().__call__(x)
        assert (tuple(self.kernel_size), tuple(self.strides),
                self.use_bias) == ((2, 2), (2, 2), False), (
            "s2d ConvTranspose supports the 2x2/stride-2/no-bias form only"
        )
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (2, 2, ci, self.features),
            self.param_dtype,
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        # flax ConvTranspose (lax.conv_transpose) applies the kernel
        # spatially FLIPPED: out[2I+p, 2J+q] = sum_ci x[I,J,ci]
        # k[1-p, 1-q, ci, co] — flip before the phase-major reshape
        k = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3)).reshape(
            ci, 4 * self.features
        )
        return jnp.einsum("nhwc,cf->nhwf", x, k)


# The s2d variants of ConvBlock/TransposeConvBlock live in models/layers.py
# as an `s2d` flag on the existing classes: the flax param path embeds the
# CLASS name, so the layout switch must not change which class runs.
