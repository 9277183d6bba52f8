"""Cartesian k-space undersampling masks.

1-D line masks over the width (phase-encoding) axis of k-space, broadcast as
[None, None, None, :] over [N, C, H, W] k-space. Conventions match the
reference (/root/reference/masks.py):

  * `pruned` is a boolean (W,) vector; True => that k-space line is zeroed.
  * The FFT layout is corner-DC (no fftshift), so the fully-sampled
    low-frequency/ACS region lives at the *borders* of the W axis:
    indices [0, center_len//2) and [center_len//2 - center_len, W).
  * For the "standard" (fastMRI random) and "equispaced" masks the
    fully-sampled central fraction is sparsity*0.32, i.e. 8% of lines at 4x
    acceleration and 4% at 8x (masks.py:48-69,86-110).

Mask generation is a one-time host-side operation (numpy RNG); the generated
`pruned` vector is then a constant baked into the jitted train step. Learnable
variants (plain `mask`, `loupe`, `taylor`) carry device-side parameters and
expose pure-jnp appliers that are differentiable.
"""

import math
import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class MaskState:
    """State of a k-space mask.

    pruned: bool (W,) — True => line zeroed.
    weight: optional learnable parameter vector (plain/loupe/taylor masks).
    kind:   registry name.
    """

    kind: str
    shape: int
    sparsity: Optional[float]
    pruned: np.ndarray
    weight: Optional[np.ndarray] = None
    # loupe hyperparameters
    pmask_slope: float = 5.0
    sample_slope: float = 12.0

    def keep_frac(self) -> float:
        return 1.0 - float(np.asarray(self.pruned).mean())


def center_len_for(sparsity: float, shape: int) -> int:
    """Number of fully-sampled low-frequency (ACS) lines.

    = round(shape * sparsity * 0.32), the fastMRI convention
    (masks.py:59-60, model.py:162).
    """
    return int(round(shape * sparsity * 0.32))


def _center_slice(center_len: int):
    """Slice selecting the NON-center region in corner-DC layout."""
    # [center_len//2 : center_len//2 - center_len] leaves the first
    # center_len//2 and last (center_len - center_len//2) lines out —
    # those border lines are the ACS region.
    return slice(center_len // 2, center_len // 2 - center_len)


def standard_mask(sparsity: float, shape: int, rng: np.random.Generator) -> np.ndarray:
    """fastMRI-style random mask: ACS borders always kept, remaining lines
    drawn uniformly so the total kept count is floor(sparsity*shape)."""
    center_len = center_len_for(sparsity, shape)
    assert center_len < shape and math.floor(sparsity * shape) >= center_len, (
        f"standard mask infeasible: shape={shape} sparsity={sparsity} gives "
        f"{center_len} ACS lines but only {math.floor(sparsity * shape)} "
        f"total kept lines — use a larger shape or sparsity"
    )
    other_ratio = (sparsity * shape - center_len) / (shape - center_len)
    prob = np.full(shape, 1.1)
    prob[_center_slice(center_len)] = other_ratio
    thresh = rng.random(shape)
    keep = np.argsort(-(prob - thresh))[: math.floor(sparsity * shape)]
    pruned = np.ones(shape, dtype=bool)
    pruned[keep] = False
    return pruned


def equispaced_mask(sparsity: float, shape: int, rng: np.random.Generator) -> np.ndarray:
    """ACS borders kept + equispaced lines with a random start offset."""
    center_len = center_len_for(sparsity, shape)
    pruned = np.zeros(shape, dtype=bool)
    sl = _center_slice(center_len)
    pruned[sl] = True
    remaining_cnt = math.floor(sparsity * shape - center_len)
    assert remaining_cnt >= 2, (
        f"equispaced mask infeasible: shape={shape} sparsity={sparsity} "
        f"leaves {remaining_cnt} non-ACS lines to place (needs >= 2 for an "
        f"equispaced comb) — use a larger shape or sparsity"
    )
    interval = int((shape - center_len - 1) // (remaining_cnt - 1))
    start_max = (shape - center_len) - ((remaining_cnt - 1) * interval + 1)
    start = int(rng.integers(0, start_max + 1))
    part = pruned[sl].copy()
    n = part.shape[0]
    # the reference places the equispaced comb in a half-rolled frame
    # (masks.py:104-110); net effect: line positions offset by (n+1)//2 mod n.
    part = np.roll(part, n // 2)
    part[start : start + interval * remaining_cnt : interval] = False
    part = np.roll(part, (n + 1) // 2)
    pruned[sl] = part
    return pruned


def lowpass_mask(sparsity: float, shape: int, rng=None) -> np.ndarray:
    """Keep only the floor(shape*sparsity) lowest-frequency (border) lines."""
    center_len = math.floor(shape * sparsity)
    if center_len < 1:
        # _center_slice(0) is the empty slice: nothing would be pruned and
        # the "undersampling" mask would keep EVERY line — the inverse of
        # the intent at the degenerate sparsity
        raise ValueError(
            f"lowpass mask with sparsity {sparsity} at width {shape} "
            "keeps 0 lines; increase sparsity or width"
        )
    pruned = np.zeros(shape, dtype=bool)
    pruned[_center_slice(center_len)] = True
    return pruned


def rescale_prob(x, sparsity):
    """Rescale probabilities so their mean equals `sparsity` (LOUPE).

    Double-where guard: jnp.where evaluates BOTH branches, and when the
    sigmoid probabilities saturate (xbar == 1.0 in f32, i.e. every logit
    above ~3.4 at slope 5) the unselected branch divides by (1 - xbar) = 0
    — its infinite partial then NaN-poisons the summed VJP even though the
    forward value is correct. The reference's host-side if/else
    (masks.py:127-139) never evaluates the dividing branch.
    """
    xbar = jnp.mean(x)
    up = xbar > sparsity
    safe_up = jnp.where(up, xbar, 1.0)
    safe_dn = jnp.where(up, 1.0, 1.0 - xbar)
    return jnp.where(
        up,
        x * sparsity / safe_up,
        1 - (1 - x) * (1 - sparsity) / safe_dn,
    )


def loupe_init_weight(shape: int, pmask_slope: float, rng: np.random.Generator) -> np.ndarray:
    """LOUPE logit init: uniform in [eps, 1-eps] pushed through logit/slope."""
    eps = 0.01
    x = rng.random(shape) * (1 - eps * 2) + eps
    return (-np.log(1.0 / x - 1.0) / pmask_slope).astype(np.float32)


def loupe_pmask(weight: jnp.ndarray, sparsity: float, pmask_slope: float) -> jnp.ndarray:
    return rescale_prob(jax.nn.sigmoid(weight * pmask_slope), sparsity)


def loupe_sample(
    weight: jnp.ndarray,
    sparsity: float,
    pmask_slope: float,
    sample_slope: float,
    key: jax.Array,
    batch: int,
    training: bool,
):
    """Draw a (soft or hard) LOUPE mask.

    Returns (mask [batch, W] float, pruned [W] bool from the first sample).
    Training: differentiable soft mask sigmoid((pmask - thresh) * slope).
    Eval: hard top-k mask with int(sparsity*W + 0.5) kept lines.
    """
    shape = weight.shape[0]
    pmask = loupe_pmask(weight, sparsity, pmask_slope)
    thresh = jax.random.uniform(key, (batch, shape), dtype=pmask.dtype)
    k = int(sparsity * shape + 0.5)
    if k < 1:
        # sort[..., k-1] with k=0 would take the MINIMUM score and keep
        # every line — the exact inverse of the reference's topk(0)
        raise ValueError(
            f"loupe mask with sparsity {sparsity} at width {shape} keeps "
            "0 lines; increase sparsity or width"
        )
    score = pmask[None, :] - thresh
    kth = -jnp.sort(-score, axis=-1)[:, k - 1 : k]
    not_pruned = score >= kth
    pruned = jnp.logical_not(not_pruned[0])
    if training:
        mask = jax.nn.sigmoid(score * sample_slope)
    else:
        mask = not_pruned.astype(pmask.dtype)
    return mask, pruned


def magnitude_prune(
    weight: np.ndarray,
    pruned: np.ndarray,
    num: int,
    thres: float = 1.0,
    random: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Magnitude-based pruning of a learnable mask (reference masks.py:17-38).

    Prunes at most `num` smallest-|w| lines with |w| < thres (already-pruned
    and above-threshold lines excluded); with `random` > 0 the ordering is
    jittered by uniform noise in [0, random).
    """
    assert thres >= 0 and random >= 0 and num >= 0
    pruned = pruned.copy()
    if num == 0:
        return pruned
    w = np.abs(np.asarray(weight, dtype=np.float64)).copy()
    big = max(random, w.max()) + thres
    w[pruned] = big
    w[w >= thres] = big
    rand = (rng.random(w.shape) if rng is not None else np.zeros_like(w)) * random
    ind = np.argsort(w - rand)[:num]
    ind = ind[w[ind] < thres]
    pruned[ind] = True
    return pruned


def make_mask(
    kind: str,
    shape: int,
    sparsity: Optional[float] = None,
    seed: Optional[int] = None,
) -> MaskState:
    """Build a MaskState by registry name.

    kinds: 'standard', 'equispaced', 'lowpass' (fixed, need sparsity);
           'mask', 'taylor' (learnable/saliency, start unpruned);
           'loupe' (learnable probabilistic, needs sparsity).
    """
    rng = np.random.default_rng(seed)
    if kind == "standard":
        return MaskState(kind, shape, sparsity, standard_mask(sparsity, shape, rng))
    if kind == "equispaced":
        return MaskState(kind, shape, sparsity, equispaced_mask(sparsity, shape, rng))
    if kind == "lowpass":
        return MaskState(kind, shape, sparsity, lowpass_mask(sparsity, shape))
    if kind == "mask":
        return MaskState(
            kind, shape, sparsity,
            np.zeros(shape, dtype=bool),
            weight=np.ones(shape, dtype=np.float32),
        )
    if kind == "taylor":
        return MaskState(kind, shape, sparsity, np.zeros(shape, dtype=bool))
    if kind == "loupe":
        pmask_slope, sample_slope = 5.0, 12.0
        weight = loupe_init_weight(shape, pmask_slope, rng)
        # reference sets `pruned` by running one forward at init
        # (masks.py:164); replicate with a hard sample.
        key = jax.random.PRNGKey(rng.integers(0, 2**31))
        _, pruned = loupe_sample(
            jnp.asarray(weight), sparsity, pmask_slope, sample_slope,
            key, batch=1, training=False,
        )
        return MaskState(
            kind, shape, sparsity, np.asarray(pruned),
            weight=weight, pmask_slope=pmask_slope, sample_slope=sample_slope,
        )
    raise ValueError(f"unknown mask kind: {kind!r}")


MASK_KINDS = ("mask", "taylor", "standard", "lowpass", "equispaced", "loupe")


def apply_mask(kspace: jnp.ndarray, pruned: jnp.ndarray) -> jnp.ndarray:
    """Zero pruned k-space lines: kspace [N,C,H,W] * (1 - pruned)[...,W]."""
    keep = 1.0 - pruned.astype(jnp.float32)
    return kspace * keep[None, None, None, :]
