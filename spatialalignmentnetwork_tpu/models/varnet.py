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

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.fft import fft2, ifft2, rss
from .layers import instance_norm, nchw_to_nhwc, nhwc_to_nchw
from .unet import NormUnet, pad_to_16


def acs_mask(width: int, num_low_frequencies: int, dtype=jnp.float32):
    """Boolean-ish [W] mask keeping only the ACS low-frequency lines in
    corner-DC layout: first `num_low` columns rolled by (-num_low)//2
    (reference varnet.py:395-398 — note the python precedence: the
    reference's `-num_low_frequencies//2` floor-divides the NEGATED value,
    which differs from -(num_low//2) for odd num_low)."""
    m = jnp.where(jnp.arange(width) < num_low_frequencies, 1.0, 0.0).astype(dtype)
    return jnp.roll(m, (-num_low_frequencies) // 2)


class SensitivityModel(nn.Module):
    """Estimate coil sensitivity maps from the ACS region of masked k-space
    (reference varnet.py:335-420)."""

    chans: int
    num_pools: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, masked_kspace: jnp.ndarray, num_low_frequencies: int):
        n, c, h, w = masked_kspace.shape
        m = acs_mask(w, num_low_frequencies)
        acs_kspace = masked_kspace * m[None, None, None, :]
        acs_images = ifft2(acs_kspace)
        # estimate each coil independently: fold coils into the batch
        batched = acs_images.reshape(n * c, 1, h, w)
        sens = NormUnet(self.chans, self.num_pools, dtype=self.dtype)(batched)
        sens = sens.reshape(n, c, h, w)
        return sens / (rss(sens) + 1e-6)


class VarNetBlock(nn.Module):
    """One unrolled cascade: k <- k - soft_dc - F S refine(S* F^-1 k)
    (reference varnet.py:488-530)."""

    chans: int
    pools: int
    use_ref: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, current_kspace, ref_kspace, mask, sens_maps, ref_image):
        # refinement through the regularizer U-Net in image space
        image = jnp.sum(
            ifft2(current_kspace) * jnp.conj(sens_maps), axis=1, keepdims=True
        )
        image = NormUnet(
            self.chans, self.pools, use_ref=self.use_ref,
            ref_prenormalized=True, dtype=self.dtype,
        )(image, ref_image if self.use_ref else None)
        model_term = fft2(image * sens_maps)
        # soft data consistency on sampled lines
        dc_weight = self.param("dc_weight", nn.initializers.ones, (1,))
        soft_dc = jnp.where(mask, current_kspace - ref_kspace, 0.0) * dc_weight
        return current_kspace - soft_dc - model_term


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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, masked_kspace, mask, ref, num_low_frequencies):
        sens_maps = SensitivityModel(
            self.sens_chans, self.sens_pools, dtype=self.dtype
        )(masked_kspace, num_low_frequencies)

        if self.use_ref:
            # hoist the cascade-invariant ref preprocessing (instance norm +
            # pad-to-16, reference varnet.py:315-319) out of the scan: it
            # would otherwise be recomputed identically in all 8 cascades
            ref = rss(ref)
            ref = nhwc_to_nchw(instance_norm(nchw_to_nhwc(ref)))
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
            body = nn.remat(body, prevent_cse=False)

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_cascades,
        )
        kspace_pred, _ = scan(
            VarNetBlock(self.chans, self.pools, self.use_ref, dtype=self.dtype),
            masked_kspace,
            (),
        )
        return rss(ifft2(kspace_pred))
