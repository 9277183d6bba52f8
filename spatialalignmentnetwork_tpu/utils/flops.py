"""Analytic forward-FLOP counts for the network zoo.

XLA's cost analysis counts `while`/`scan` loop bodies ONCE regardless of
trip count, so a cost_analysis of the cascaded VarNet under-reports by
roughly num_cascades x (observed: 14.76 GFLOP/slice reported for the
8-cascade flagship whose true cost is ~87 GFLOP/slice). The benchmark's
MFU plausibility guard needs true totals, so count them analytically from
the architecture definition (mirroring models/unet.py + models/varnet.py).

Conventions: 1 MAC = 2 FLOPs; a complex MAC = 4 real multiplies + 4 adds
(counted as 8 FLOPs); FFT cost uses the standard 5*N*log2(N) real-FLOP
estimate per length-N transform line. Elementwise work (norms,
activations, data consistency) is excluded — it is bandwidth, not FLOPs.
"""

import math


def conv2d_flops(h, w, kh, kw, cin, cout):
    """Dense stride-1 'SAME' conv over one sample."""
    return 2 * h * w * kh * kw * cin * cout


def unet_flops(h, w, in_chans, out_chans, chans, num_pools):
    """fastMRI Unet (models/unet.py Unet): ConvBlock = 2 convs per level;
    down path, bottleneck, up path (TransposeConvBlock + post-concat
    ConvBlock), final 1x1 conv."""
    total = 0
    chs = [chans * (2 ** i) for i in range(num_pools)]
    hh, ww = h, w
    # down path
    cin = in_chans
    for c in chs:
        total += conv2d_flops(hh, ww, 3, 3, cin, c)
        total += conv2d_flops(hh, ww, 3, 3, c, c)
        cin = c
        hh, ww = hh // 2, ww // 2
    # bottleneck
    total += conv2d_flops(hh, ww, 3, 3, chs[-1], chs[-1] * 2)
    total += conv2d_flops(hh, ww, 3, 3, chs[-1] * 2, chs[-1] * 2)
    cur = chs[-1] * 2
    # up path
    for c in reversed(chs):
        hh, ww = hh * 2, ww * 2
        # ConvTranspose 2x2 stride 2: one MAC per output pixel per (cin,cout)
        total += 2 * hh * ww * cur * c
        # post-concat ConvBlock: in 2c -> c, then c -> c
        total += conv2d_flops(hh, ww, 3, 3, 2 * c, c)
        total += conv2d_flops(hh, ww, 3, 3, c, c)
        cur = c
    total += conv2d_flops(hh, ww, 1, 1, cur, out_chans)
    return total


def _pad16(n):
    return ((n - 1) | 15) + 1


def normunet_flops(h, w, chans, num_pools, in_chans=1, use_ref=False):
    """NormUnet (models/unet.py): Unet over [2*in (+1 ref)] real channels at
    the padded-to-16 resolution."""
    hp, wp = _pad16(h), _pad16(w)
    cin = 2 * in_chans + (1 if use_ref else 0)
    return unet_flops(hp, wp, cin, 2 * in_chans, chans, num_pools)


def fft2_flops(h, w, channels=1, impl="xla"):
    """Orthonormal complex 2-D FFT of one [h, w] plane per channel.

    impl='xla': the native FFT at the standard 5*N*log2(N) real-FLOP
    estimate (h rows of length-w transforms + w cols of length-h).
    impl='matmul': the matmul-DFT (ops/fft.py _dft2) does four real
    [n, n] matmuls per axis — 8*h^2*w + 8*w^2*h real FLOPs per plane,
    ~60x the native count at 320 (it wins on wall-clock, not FLOPs;
    the benchmark's MFU must account for the work actually dispatched).
    """
    if impl == "matmul":
        per_plane = 8.0 * h * w * (h + w)
    else:
        per_plane = 5.0 * h * w * (math.log2(w) + math.log2(h))
    return per_plane * channels


def varnet_flops(shape, coils=1, num_cascades=8, sens_chans=8, sens_pools=4,
                 chans=18, pools=4, use_ref=True, fft_impl="xla"):
    """True per-slice forward FLOPs of the flagship VarNet
    (models/varnet.py; reference varnet.py:422-530). fft_impl must match
    the path actually dispatched (ops.fft.active_fft_impl())."""
    h = w = shape
    total = 0.0
    # SensitivityModel: masked ifft2 per coil + per-coil NormUnet + rss
    total += fft2_flops(h, w, coils, fft_impl)
    total += coils * normunet_flops(h, w, sens_chans, sens_pools)
    # cascades: ifft2 + sens_reduce (complex mul: 8 flops/px/coil) +
    # NormUnet + sens_expand + fft2 per cascade
    per_cascade = (
        fft2_flops(h, w, coils, fft_impl) * 2
        + 2 * (8.0 * h * w * coils)
        + normunet_flops(h, w, chans, pools, use_ref=use_ref)
    )
    total += num_cascades * per_cascade
    # final ifft2 + rss
    total += fft2_flops(h, w, coils, fft_impl)
    return total
