"""End-to-end variational network (VarNet) for accelerated MRI recon.

TPU-native re-implementation of the 8-cascade unrolled reconstruction with
learned coil sensitivities and soft k-space data consistency (reference
varnet.py:335-530, derived from facebookresearch/fastMRI), extended with the
`use_ref` channel that injects the warped reference-modality image into every
cascade's regularizer U-Net (varnet.py:315-319).

TPU-first design notes:
  * The cascade loop is a `nn.scan` over a single VarNetBlock with stacked
    per-cascade parameters: one compiled cascade body instead of 8 unrolled
    copies (faster compiles, identical math). XLA still overlaps FFTs and
    convs across the scan body.
  * The per-coil sensitivity U-Net runs as one big batch (N*C) — no VRAM
    chunking (reference varnet.py:409-414); on TPU prefer full batching and
    rematerialization.
  * FFTs lower to the XLA FFT op; all convs hit the MXU.
"""

import os
from typing import Any

import jax.numpy as jnp
import flax.linen as nn


def _remat_policy():
    """Rematerialization policy for the cascade body (SAN_TPU_REMAT).

    'full' (default): save nothing — the backward recomputes the whole
    cascade body; minimum HBM (the scan stores only k-space carries).
    'dots': save dot_general outputs — with the matmul-DFT FFT path the
    per-cascade DFT products are kept instead of recomputed in the
    backward, trading a little HBM for backward FLOPs.

    Read at trace time (like SAN_TPU_IN) so setting the env after import
    still takes effect; strict parsing — a typo errors instead of
    silently picking a path.
    """
    v = os.environ.get("SAN_TPU_REMAT", "full").strip().lower()
    if v == "full":
        return None
    if v == "dots":
        import jax

        return jax.checkpoint_policies.dots_saveable
    raise ValueError(f"SAN_TPU_REMAT: expected 'full' or 'dots', got {v!r}")


def _kspace_bf16() -> bool:
    """SAN_TPU_KSPACE: f32 (default) | bf16 — precision of the cascade
    k-space chain (the scan carry + its per-cascade updates).

    The f32 chain is deliberate: k-space has the dynamic range of the DC
    line, and the HBM-dtype audit (PERF.md round-4) kept it f32 on a ~0.1 dB
    risk ARGUMENT. This opt-in makes that call MEASURED: bf16 quantizes the
    carry each cascade (planar mode stores the real carry in actual bf16 —
    the bandwidth win; complex mode round-trips both components through
    bf16 — the same quantization error without the storage win, since
    complex64 has no bf16 sibling). Recorded ΔPSNR: see PERF.md round-5.
    Read at trace time; strict parsing like the other levers.
    """
    v = os.environ.get("SAN_TPU_KSPACE", "f32").strip().lower()
    if v in ("f32", "float32"):
        return False
    if v in ("bf16", "bfloat16"):
        return True
    raise ValueError(f"SAN_TPU_KSPACE: expected 'f32' or 'bf16', got {v!r}")


def quantize_kspace(x: jnp.ndarray) -> jnp.ndarray:
    """Apply the SAN_TPU_KSPACE policy to a k-space array (no-op at f32)."""
    if not _kspace_bf16():
        return x
    if jnp.iscomplexobj(x):
        import jax

        return jax.lax.complex(
            x.real.astype(jnp.bfloat16).astype(jnp.float32),
            x.imag.astype(jnp.bfloat16).astype(jnp.float32),
        )
    return x.astype(jnp.bfloat16)

from ..ops.fft import (
    fft2, ifft2, rss, fft2_planar, ifft2_planar, rss_planar,
)
from .layers import instance_norm, nchw_to_nhwc, nhwc_to_nchw
from .unet import NormUnet, pad_to_16, pad_to_16_nhwc


def acs_mask(width: int, num_low_frequencies: int, dtype=jnp.float32):
    """Boolean-ish [W] mask keeping only the ACS low-frequency lines in
    corner-DC layout: first `num_low` columns rolled by (-num_low)//2
    (reference varnet.py:395-398 — note the python precedence: the
    reference's `-num_low_frequencies//2` floor-divides the NEGATED value,
    which differs from -(num_low//2) for odd num_low)."""
    m = jnp.where(jnp.arange(width) < num_low_frequencies, 1.0, 0.0).astype(dtype)
    return jnp.roll(m, (-num_low_frequencies) // 2)


# ---------------------------------------------------------- planar helpers
# The planar layout carries k-space/images as REAL NHWC [N, H, W, 2C]
# (channels [re_0..re_{C-1}, im_0..im_{C-1}]) through the whole cascade:
# the DFT matmuls, convs, norms and data consistency all operate on the
# pair directly, so no complex intermediates or NCHW<->NHWC transposes are
# materialized per cascade (PERF.md "complex-as-planar" lever).
def complex_to_planar(x_nchw: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] complex -> [N, H, W, 2C] real planar."""
    m = jnp.moveaxis(x_nchw, 1, -1)  # [N, H, W, C] complex
    return jnp.concatenate([m.real, m.imag], axis=-1)


def planar_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 2C] real planar -> [N, C, H, W] complex."""
    import jax

    c = x.shape[-1] // 2
    re = jnp.moveaxis(x[..., :c], -1, 1)
    im = jnp.moveaxis(x[..., c:], -1, 1)
    return jax.lax.complex(re, im)


def _planar_cmul(ar, ai, br, bi):
    """(ar + i ai) * (br + i bi) -> (re, im)."""
    return ar * br - ai * bi, ar * bi + ai * br


def sens_reduce_planar(k_planar, sens_planar):
    """S* F^-1 k, summed over coils: [N,H,W,2C] x [N,H,W,2C] -> [N,H,W,2]."""
    c = k_planar.shape[-1] // 2
    yr, yi = k_planar[..., :c], k_planar[..., c:]
    sr, si = sens_planar[..., :c], sens_planar[..., c:]
    re, im = _planar_cmul(yr, yi, sr, -si)  # y * conj(s)
    return jnp.concatenate(
        [jnp.sum(re, -1, keepdims=True), jnp.sum(im, -1, keepdims=True)],
        axis=-1,
    )


def sens_expand_planar(img_planar, sens_planar):
    """x * S per coil: [N,H,W,2] x [N,H,W,2C] -> [N,H,W,2C]."""
    c = sens_planar.shape[-1] // 2
    xr, xi = img_planar[..., :1], img_planar[..., 1:]
    sr, si = sens_planar[..., :c], sens_planar[..., c:]
    re, im = _planar_cmul(xr, xi, sr, si)
    return jnp.concatenate([re, im], axis=-1)


class SensitivityModel(nn.Module):
    """Estimate coil sensitivity maps from the ACS region of masked k-space
    (reference varnet.py:335-420)."""

    chans: int
    num_pools: int
    planar: bool = False
    s2d_levels: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, masked_kspace: jnp.ndarray, num_low_frequencies: int):
        if self.planar:
            return self._planar_forward(masked_kspace, num_low_frequencies)
        n, c, h, w = masked_kspace.shape
        m = acs_mask(w, num_low_frequencies)
        acs_kspace = masked_kspace * m[None, None, None, :]
        acs_images = ifft2(acs_kspace)
        # estimate each coil independently: fold coils into the batch
        batched = acs_images.reshape(n * c, 1, h, w)
        sens = NormUnet(
            self.chans, self.num_pools, s2d_levels=self.s2d_levels,
            dtype=self.dtype,
        )(batched)
        sens = sens.reshape(n, c, h, w)
        return sens / (rss(sens) + 1e-6)

    def _planar_forward(self, k_planar, num_low_frequencies):
        """Planar layout: k [N, H, W, 2C] -> sens maps [N, H, W, 2C]."""
        n, h, w, k2 = k_planar.shape
        c = k2 // 2
        m = acs_mask(w, num_low_frequencies)
        acs = ifft2_planar(k_planar * m[None, None, :, None])
        if c == 1:
            batched = acs
        else:
            # fold coils into the batch (one transpose; sens runs once)
            re = jnp.moveaxis(acs[..., :c], -1, 1).reshape(n * c, h, w, 1)
            im = jnp.moveaxis(acs[..., c:], -1, 1).reshape(n * c, h, w, 1)
            batched = jnp.concatenate([re, im], axis=-1)
        sens = NormUnet(
            self.chans, self.num_pools, planar=True,
            s2d_levels=self.s2d_levels, dtype=self.dtype,
        )(batched)
        if c > 1:
            re = jnp.moveaxis(sens[..., 0].reshape(n, c, h, w), 1, -1)
            im = jnp.moveaxis(sens[..., 1].reshape(n, c, h, w), 1, -1)
            sens = jnp.concatenate([re, im], axis=-1)
        return sens / (rss_planar(sens) + 1e-6)


class VarNetBlock(nn.Module):
    """One unrolled cascade: k <- k - soft_dc - F S refine(S* F^-1 k)
    (reference varnet.py:488-530)."""

    chans: int
    pools: int
    use_ref: bool
    planar: bool = False
    s2d_levels: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, current_kspace, ref_kspace, mask, sens_maps, ref_image):
        if self.planar:
            # identical math on the planar pair: no complex intermediates,
            # no layout transposes inside the cascade
            image = sens_reduce_planar(
                ifft2_planar(current_kspace), sens_maps
            )
            image = NormUnet(
                self.chans, self.pools, use_ref=self.use_ref,
                ref_prenormalized=True, planar=True,
                s2d_levels=self.s2d_levels, dtype=self.dtype,
            )(image, ref_image if self.use_ref else None)
            model_term = fft2_planar(sens_expand_planar(image, sens_maps))
            dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
            soft_dc = jnp.where(
                mask, current_kspace - ref_kspace, 0.0
            ) * dc_weight
            # updates computed in f32 (dtype promotion above), carry stored
            # per SAN_TPU_KSPACE (bf16 halves the scan-carry HBM traffic)
            return quantize_kspace(current_kspace - soft_dc - model_term)
        # refinement through the regularizer U-Net in image space
        image = jnp.sum(
            ifft2(current_kspace) * jnp.conj(sens_maps), axis=1, keepdims=True
        )
        image = NormUnet(
            self.chans, self.pools, use_ref=self.use_ref,
            ref_prenormalized=True, s2d_levels=self.s2d_levels,
            dtype=self.dtype,
        )(image, ref_image if self.use_ref else None)
        model_term = fft2(image * sens_maps)
        # soft data consistency on sampled lines
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
        soft_dc = jnp.where(mask, current_kspace - ref_kspace, 0.0) * dc_weight
        return quantize_kspace(current_kspace - soft_dc - model_term)


class VarNet(nn.Module):
    """Full variational network (reference varnet.py:422-486).

    forward(masked_kspace [N,C,H,W] c64, mask (broadcastable bool),
            ref [N,C,H,W] real or None, num_low_frequencies) -> [N,1,H,W] real
    """

    num_cascades: int = 12
    sens_chans: int = 8
    sens_pools: int = 4
    chans: int = 18
    pools: int = 4
    use_ref: bool = False
    remat: bool = False  # rematerialize cascade bodies (training memory)
    # planar=True runs the whole cascade in the planar-NHWC layout (same
    # parameters, same math): complex<->planar conversion happens exactly
    # once at each boundary instead of per cascade. The external API is
    # unchanged (complex NCHW in, real NCHW out).
    planar: bool = False
    # execute the k shallowest levels of every NormUnet (cascades + sens)
    # in the space-to-depth layout (models/s2d.py): parameter-identical,
    # ~3-4x MXU lane efficiency on the small-channel convs
    s2d_levels: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, masked_kspace, mask, ref, num_low_frequencies):
        if self.planar:
            return self._planar_forward(
                masked_kspace, mask, ref, num_low_frequencies
            )
        sens_maps = SensitivityModel(
            self.sens_chans, self.sens_pools, s2d_levels=self.s2d_levels,
            dtype=self.dtype,
        )(masked_kspace, num_low_frequencies)

        if self.use_ref:
            # hoist the cascade-invariant ref preprocessing (instance norm +
            # pad-to-16, reference varnet.py:315-319) out of the scan: it
            # would otherwise be recomputed identically in all 8 cascades
            ref = rss(ref)
            # raw RSS magnitude (not a post-conv activation): a near-flat
            # plane can cancel all variance bits in the one-pass form
            ref = nhwc_to_nchw(
                instance_norm(nchw_to_nhwc(ref), one_pass=False)
            )
            ref, _ = pad_to_16(ref)
        else:
            ref = None

        if mask.ndim == 1:
            mask = mask[None, None, None, :]

        # scan over cascades with stacked per-cascade params: one compiled
        # body, 8x reuse. broadcast the constants into the body.
        def body(block, kspace_pred, _):
            out = block(kspace_pred, masked_kspace, mask, sens_maps, ref)
            return out, ()

        if self.remat:
            # trade FLOPs for HBM: recompute each cascade's activations in
            # the backward pass instead of storing 8 cascades' worth
            body = nn.remat(body, prevent_cse=False, policy=_remat_policy())

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_cascades,
        )
        kspace_pred, _ = scan(
            VarNetBlock(
                self.chans, self.pools, self.use_ref,
                s2d_levels=self.s2d_levels, dtype=self.dtype,
            ),
            quantize_kspace(masked_kspace),  # no-op at SAN_TPU_KSPACE=f32
            (),
        )
        return rss(ifft2(kspace_pred))

    def _planar_forward(self, masked_kspace, mask, ref, num_low_frequencies):
        if jnp.iscomplexobj(masked_kspace):
            k_planar = complex_to_planar(masked_kspace)
        else:
            # already-planar input ([N, H, W, 2C]) for fully-planar callers
            k_planar = masked_kspace

        sens_maps = SensitivityModel(
            self.sens_chans, self.sens_pools, planar=True,
            s2d_levels=self.s2d_levels, dtype=self.dtype,
        )(k_planar, num_low_frequencies)

        if self.use_ref:
            ref = rss(ref)  # [N, 1, H, W]
            # raw RSS magnitude: pin the cancellation-safe two-pass stats
            ref = instance_norm(
                nchw_to_nhwc(ref), one_pass=False
            )  # [N, H, W, 1]
            ref, _ = pad_to_16_nhwc(ref)
        else:
            ref = None

        if mask.ndim == 1:
            mask_p = mask[None, None, :, None]
        else:  # [..., W] broadcastable NCHW bool -> NHWC position
            mask_p = jnp.reshape(mask, mask.shape[-1:])[None, None, :, None]

        def body(block, kspace_pred, _):
            out = block(kspace_pred, k_planar, mask_p, sens_maps, ref)
            return out, ()

        if self.remat:
            body = nn.remat(body, prevent_cse=False, policy=_remat_policy())

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_cascades,
        )
        kspace_pred, _ = scan(
            VarNetBlock(
                self.chans, self.pools, self.use_ref, planar=True,
                s2d_levels=self.s2d_levels, dtype=self.dtype,
            ),
            quantize_kspace(k_planar),  # no-op at SAN_TPU_KSPACE=f32
            (),
        )
        out = rss_planar(ifft2_planar(kspace_pred))  # [N, H, W, 1]
        return nhwc_to_nchw(out)
