"""Pallas TPU kernel: 3x3 stride-1 SAME conv via a space-to-depth GEMM.

Why: the recon UNets (reference varnet.py:122-156) run 3x3 convs with as
few as 18 channels at 320x320. A direct im2col GEMM maps those to MXU
tiles as [M, K=9C] @ [K, N=C]: with C=18 the N dimension fills 18/128
lanes and K pads 162->256, a ~9% utilization ceiling (XLA measures ~5%).

Grouping 2x2 output pixels into the channel dimension (= convolving the
2x2-space-to-depth image with an equivalent 2x2 kernel) rewrites the same
math as [M/4, K=16C] @ [K, N=4C]: for C=18 that is K=288, N=72 — a 24%
utilization ceiling, ~2.7x better. The weight transform is exact (zeros
where the 3x3 taps fall outside a phase's window), so outputs match the
direct convolution bit-for-bit up to dot-product ordering.

Decomposition:
  * XLA side: pad H,W by 1, split into 4 phases (s2d), call the kernel,
    merge phases back (d2s). The phase split/merge are pure transposes
    XLA fuses with neighbours.
  * Pallas side: a VALID 2x2 conv as a banded GEMM. Grid (batch, row
    bands); the input band (+1 halo row) is DMA'd from HBM explicitly
    (BlockSpec index maps cannot express overlapping blocks); the output
    band is a regular pipelined BlockSpec.

Forward-only kernel with a custom VJP: d_input reuses this same kernel
(the gradient of a stride-1 SAME 3x3 conv is a SAME 3x3 conv with the
kernel rotated 180 degrees and in/out channels swapped); d_weights falls
back to XLA's native conv-backward-filter which maps to a well-shaped
[K, M] @ [M, N] contraction already.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def s2d_weights(w3):
    """[3,3,Cin,Cout] -> equivalent 2x2-phase kernel [2,2,4Cin,4Cout].

    Output phase (a,b) at s2d pixel (h,w) is the conv output at
    (2h+a, 2w+b); its 3x3 padded window rows are 2h+a+ky. Phase-image
    pixel (h+dy) phase s holds padded row 2(h+dy)+s, so the tap lands at
    ky = 2*dy + s - a (and kx = 2*dx + t - b), zero outside [0, 2].
    """
    cin, cout = w3.shape[2], w3.shape[3]
    w2 = jnp.zeros((2, 2, 4 * cin, 4 * cout), w3.dtype)
    for dy in range(2):
        for dx in range(2):
            for s in range(2):
                for t in range(2):
                    for a in range(2):
                        for b in range(2):
                            ky = 2 * dy + s - a
                            kx = 2 * dx + t - b
                            if 0 <= ky <= 2 and 0 <= kx <= 2:
                                w2 = w2.at[
                                    dy, dx,
                                    (2 * s + t) * cin:(2 * s + t + 1) * cin,
                                    (2 * a + b) * cout:(2 * a + b + 1) * cout,
                                ].set(w3[ky, kx])
    return w2


def _conv2x2_valid_kernel(x_ref, halo_ref, w_ref, o_ref, *, bh, wp, c4):
    """One (batch, band) program: VALID 2x2 conv of a [bh+1, wp+1, c4] band.

    Overlapping blocks are inexpressible in BlockSpec index maps, so the
    band's +1 halo row arrives as a separate pipelined input:
    x_ref [1, bh, wp+1, c4] (rows i*bh..i*bh+bh-1), halo_ref
    [1, 1, wp+1, c4] (row i*bh+bh). w_ref [4*c4, c4o] GEMM weights.
    """
    band = jnp.concatenate([x_ref[0], halo_ref[0]], axis=0)
    # patches [bh*wp, 4*c4]: (dy, dx) in {0,1}^2 of the VALID 2x2 window
    cols = []
    for dy in range(2):
        for dx in range(2):
            cols.append(
                band[dy:dy + bh, dx:dx + wp, :].reshape(bh * wp, c4)
            )
    patches = jnp.concatenate(cols, axis=1)
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, wp, -1).astype(o_ref.dtype)


def _pick_band(h):
    """Rows per program: a divisor of h near 40 keeps the patch scratch
    small while the GEMM M dim stays >= ~10 MXU tiles."""
    for cand in (40, 32, 20, 16, 10, 8, 5, 4, 2, 1):
        if h % cand == 0:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_s2d(x, w3, interpret=False):
    n, h, wdt, c = x.shape
    cout = w3.shape[3]
    assert h % 2 == 0 and wdt % 2 == 0, "s2d conv needs even H, W"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 4-phase split: [N, (H+2)/2, (W+2)/2, 4C], phase index 2s+t
    phases = [xp[:, s::2, t::2, :] for s in range(2) for t in range(2)]
    ximg = jnp.concatenate(phases, axis=-1)
    hp, wp = h // 2, wdt // 2  # VALID 2x2 output size (input hp+1, wp+1)
    c4, c4o = 4 * c, 4 * cout

    w2 = s2d_weights(w3).reshape(4 * c4, c4o).astype(x.dtype)

    bh = _pick_band(hp)
    nb = hp // bh
    grid = (n, nb)
    body = ximg[:, :hp]  # rows 0..hp-1, tiled exactly by bands
    # halo rows: band i needs row (i+1)*bh as its +1 overlap
    halos = ximg[:, bh::bh]  # [n, nb, wp+1, c4]
    out = pl.pallas_call(
        functools.partial(_conv2x2_valid_kernel, bh=bh, wp=wp, c4=c4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, wp + 1, c4), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wp + 1, c4), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c4, c4o), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wp, c4o), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c4o), x.dtype),
        interpret=interpret,
    )(body, halos, w2)

    # d2s: [N, hp, wp, (2a+b)*cout] -> [N, H, W, cout]
    out = out.reshape(n, hp, wp, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, wdt, cout)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_s2d(x, w3, interpret=False):
    """3x3 stride-1 SAME conv, NHWC, no bias: x [N,H,W,Cin], w3
    [3,3,Cin,Cout] -> [N,H,W,Cout]. H and W must be even. Matches
    lax.conv_general_dilated(NHWC, HWIO, SAME) up to dot-order rounding;
    accumulation is f32 regardless of input dtype."""
    return _conv3x3_s2d(x, w3, interpret)


def _fwd(x, w3, interpret=False):
    return _conv3x3_s2d(x, w3, interpret), (x, w3)


def _bwd(interpret, res, g):
    x, w3 = res
    g = g.astype(x.dtype)
    # d_input: SAME 3x3 conv of g with the 180-degree-rotated,
    # channel-transposed kernel — the same s2d kernel again
    w_rot = jnp.flip(jnp.flip(w3, 0), 1).transpose(0, 1, 3, 2)
    dx = _conv3x3_s2d(g, w_rot, interpret)
    # d_weights: XLA's conv-backward-filter ([K, M] @ [M, N] with M huge)
    # is already well-shaped for the MXU; no kernel needed
    dw = jax.vjp(
        lambda w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ),
        w3,
    )[1](g.astype(jnp.float32))[0].astype(w3.dtype)
    return dx.astype(x.dtype), dw


conv3x3_s2d.defvjp(_fwd, _bwd)
