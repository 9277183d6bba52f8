"""Fused Pallas TPU kernels for the Parzen-window MI loss — forward AND
backward.

Reference semantics (miloss.py:26-57): per sample, Gaussian kernel
responses of every pixel to 64 intensity bin centers form [B, M] matrices
whose row-means give marginal densities and whose cross product gives the
joint density; MI = ent_I + ent_J - ent_joint (loss is its negative).

The naive [64, M] response matrix for a 320x320 slice is ~26 MB — too big
for VMEM and a round-trip to HBM in the XLA lowering. This kernel streams
the image through VMEM in chunks: per chunk it computes both response
blocks [64, K] in-register, accumulates the marginal sums [64] and the
joint [64, 64] Gram update on the MXU, and finishes with the entropy
arithmetic — one pass over the pixels, nothing spilled.

The backward (round 3, `_mi_bwd_kernel`) is the closed-form gradient fused
into the same chunk-streaming shape: pass 1 re-accumulates the tiny
marginal/joint stats, pass 2 re-streams the pixels emitting dI/dJ — the
[bins, M] response matrices never exist in HBM in either direction.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_CHUNK = 2048


def _mi_kernel(i_ref, j_ref, out_ref, *, m, bins, sigma, minv, maxv):
    m_padded = i_ref.shape[2]
    n_chunks = m_padded // _CHUNK

    # Mosaic iota must be integer-typed; convert after
    centers = (
        jax.lax.broadcasted_iota(jnp.int32, (bins, 1), 0).astype(jnp.float32)
        * ((maxv - minv) / (bins - 1))
        + minv
    )  # [B, 1]
    norm1d = math.sqrt(2.0 * math.pi) * sigma
    inv_two_sigma2 = 1.0 / (2.0 * sigma * sigma)

    def responses(vals_chunk):
        # [B, K] Gaussian kernel responses
        d = vals_chunk - centers  # [B, K] via broadcast of [1, K] - [B, 1]
        return jnp.exp(-(d * d) * inv_two_sigma2) / norm1d

    def body(c, carry):
        s_i, s_j, joint = carry
        # dynamic REF slices (Mosaic has no in-register dynamic_slice)
        sl = pl.ds(c * _CHUNK, _CHUNK)
        pi = responses(i_ref[0, :, sl])  # [1, K] block
        pj = responses(j_ref[0, :, sl])
        s_i = s_i + jnp.sum(pi, axis=1, keepdims=True)
        s_j = s_j + jnp.sum(pj, axis=1, keepdims=True)
        joint = joint + jax.lax.dot_general(
            pi, pj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return s_i, s_j, joint

    init = (
        jnp.zeros((bins, 1), jnp.float32),
        jnp.zeros((bins, 1), jnp.float32),
        jnp.zeros((bins, bins), jnp.float32),
    )
    s_i, s_j, joint = jax.lax.fori_loop(0, n_chunks, body, init)

    def entropy_marginal(s):
        p = s / m  # row-mean over the TRUE pixel count
        p = p / (jnp.sum(p) + 1e-10)
        return -jnp.sum(p * jnp.log(p + 1e-10))

    ent_i = entropy_marginal(s_i)
    ent_j = entropy_marginal(s_j)
    norm2d = 2.0 * math.pi * sigma * sigma
    pj_mat = joint / norm2d
    pj_mat = pj_mat / (jnp.sum(pj_mat) + 1e-10)
    ent_joint = -jnp.sum(pj_mat * jnp.log(pj_mat + 1e-10))

    neg_mi = -(ent_i + ent_j - ent_joint)
    out_ref[0, :, :] = jnp.full((8, 128), neg_mi, jnp.float32)


def _forward(I, J, bins, sigma, minv, maxv, interpret):
    n = I.shape[0]
    m = 1
    for d in I.shape[1:]:
        m *= d
    m_padded = ((m + _CHUNK - 1) // _CHUNK) * _CHUNK
    flat_i = I.reshape(n, m).astype(jnp.float32)
    flat_j = J.reshape(n, m).astype(jnp.float32)
    if m_padded != m:
        # pad with values far outside [minv, maxv]: their Gaussian
        # responses underflow to exactly 0, contributing nothing
        pad = jnp.full((n, m_padded - m), 1e6, jnp.float32)
        flat_i = jnp.concatenate([flat_i, pad], axis=1)
        flat_j = jnp.concatenate([flat_j, pad], axis=1)

    kernel = functools.partial(
        _mi_kernel, m=m, bins=bins, sigma=sigma, minv=minv, maxv=maxv
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            # middle singleton keeps the trailing block dims TPU-tileable
            pl.BlockSpec((1, 1, m_padded), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m_padded), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(flat_i[:, None, :], flat_j[:, None, :])
    return jnp.mean(out[:, 0, 0])


def _mi_bwd_kernel(i_ref, j_ref, di_ref, dj_ref, *, m, bins, sigma,
                   minv, maxv):
    """Closed-form MI gradient, fused and chunk-streamed (round 3).

    Pass 1 re-accumulates the marginal sums and the [B, B] joint Gram
    (identical to the forward — cheap relative to an HBM round trip of
    the [B, M] response matrices). From those, the per-bin entropy weight
    vectors w and the joint coefficient matrix EQ are tiny [B]/[B, B]
    arrays. Pass 2 re-streams the pixels: for each chunk

        dL/dp_I = -w_I/m + (EQ @ p_J)/Z2          (and transposed for J)
        dL/dv_i = (sum_a dL*p*c_a - v_i sum_a dL*p) / sigma^2

    so the full-size response matrices still never exist in HBM.
    """
    m_padded = i_ref.shape[2]
    n_chunks = m_padded // _CHUNK

    centers = (
        jax.lax.broadcasted_iota(jnp.int32, (bins, 1), 0).astype(jnp.float32)
        * ((maxv - minv) / (bins - 1))
        + minv
    )  # [B, 1]
    norm1d = math.sqrt(2.0 * math.pi) * sigma
    inv_two_sigma2 = 1.0 / (2.0 * sigma * sigma)
    inv_sigma2 = 1.0 / (sigma * sigma)

    def responses(vals_chunk):
        d = vals_chunk - centers
        return jnp.exp(-(d * d) * inv_two_sigma2) / norm1d

    def body(c, carry):
        s_i, s_j, joint = carry
        sl = pl.ds(c * _CHUNK, _CHUNK)
        pi = responses(i_ref[0, :, sl])
        pj = responses(j_ref[0, :, sl])
        s_i = s_i + jnp.sum(pi, axis=1, keepdims=True)
        s_j = s_j + jnp.sum(pj, axis=1, keepdims=True)
        joint = joint + jax.lax.dot_general(
            pi, pj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return s_i, s_j, joint

    init = (
        jnp.zeros((bins, 1), jnp.float32),
        jnp.zeros((bins, 1), jnp.float32),
        jnp.zeros((bins, bins), jnp.float32),
    )
    s_i, s_j, joint = jax.lax.fori_loop(0, n_chunks, body, init)

    # d(ent)/d(s_b) = w_b / m for a marginal built as pn = (s/m)/T
    def marg_w(s):
        u = s / m
        T = jnp.sum(u) + 1e-10
        pn = u / T
        lc = jnp.log(pn + 1e-10) + pn / (pn + 1e-10)
        return -(lc - jnp.sum(lc * pn)) / T  # [B, 1]

    w_i = marg_w(s_i)
    w_j = marg_w(s_j)
    norm2d = 2.0 * math.pi * sigma * sigma
    G = joint / norm2d
    Sg = jnp.sum(G) + 1e-10
    q = G / Sg
    lq = jnp.log(q + 1e-10) + q / (q + 1e-10)
    # dL/dG for L = ... + ent_joint (the loss's joint term enters with +)
    EQ = -(lq - jnp.sum(lq * q)) / Sg  # [B, B]

    def body2(c, _):
        sl = pl.ds(c * _CHUNK, _CHUNK)
        vi = i_ref[0, :, sl]  # [1, K]
        vj = j_ref[0, :, sl]
        pi = responses(vi)
        pj = responses(vj)
        # on-chip hazard (found 2026-08-19, tests/test_pallas_tpu.py): a
        # Mosaic dot without an explicit precision rounds f32 operands to
        # bf16; the CPU interpreter does not, so only the real chip saw it.
        # The EQ contractions get precision=HIGHEST like every other kernel
        # in this package, and the pixel gradient is restructured to cancel
        # BEFORE reducing: (sum_b A_b c_b) - v (sum_b A_b) is a difference
        # of near-equal numbers amplified by 1/sigma^2 = 4096, while
        # sum_b A_b (c_b - v) subtracts first and reduces on the VPU in
        # f32 — same math, no catastrophic cancellation to amplify.
        dLdpI = (-w_i / m) + jax.lax.dot_general(
            EQ, pj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / norm2d
        dLdpJ = (-w_j / m) + jax.lax.dot_general(
            EQ, pi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / norm2d

        def pixel_grad(dLdp, p, v):
            A = dLdp * p  # [B, K]
            return jnp.sum(
                A * (centers - v), axis=0, keepdims=True
            ) * inv_sigma2

        di_ref[0, :, sl] = pixel_grad(dLdpI, pi, vi)
        dj_ref[0, :, sl] = pixel_grad(dLdpJ, pj, vj)
        return 0

    jax.lax.fori_loop(0, n_chunks, body2, 0)


def _backward(I, J, bins, sigma, minv, maxv, interpret):
    n = I.shape[0]
    m = 1
    for d in I.shape[1:]:
        m *= d
    m_padded = ((m + _CHUNK - 1) // _CHUNK) * _CHUNK
    flat_i = I.reshape(n, m).astype(jnp.float32)
    flat_j = J.reshape(n, m).astype(jnp.float32)
    if m_padded != m:
        pad = jnp.full((n, m_padded - m), 1e6, jnp.float32)
        flat_i = jnp.concatenate([flat_i, pad], axis=1)
        flat_j = jnp.concatenate([flat_j, pad], axis=1)

    kernel = functools.partial(
        _mi_bwd_kernel, m=m, bins=bins, sigma=sigma, minv=minv, maxv=maxv
    )
    dI, dJ = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, m_padded), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m_padded), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m_padded), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m_padded), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, m_padded), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, m_padded), jnp.float32),
        ],
        interpret=interpret,
    )(flat_i[:, None, :], flat_j[:, None, :])
    return (
        dI[:, 0, :m].reshape(I.shape),
        dJ[:, 0, :m].reshape(J.shape),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _mi_pallas(I, J, bins, sigma, minv, maxv, interpret):
    return _forward(I, J, bins, sigma, minv, maxv, interpret)


def _fwd(I, J, bins, sigma, minv, maxv, interpret):
    return _forward(I, J, bins, sigma, minv, maxv, interpret), (I, J)


def _bwd(bins, sigma, minv, maxv, interpret, res, g):
    I, J = res
    dI, dJ = _backward(I, J, bins, sigma, minv, maxv, interpret)
    # batch mean: per-sample gradients scale by upstream/N
    scale = (g / I.shape[0]).astype(jnp.float32)
    return (scale * dI).astype(I.dtype), (scale * dJ).astype(J.dtype)


_mi_pallas.defvjp(_fwd, _bwd)


def mi_loss_pallas(I, J, bins=64, sigma=1.0 / 64, minVal=0.0, maxVal=1.0,
                   interpret=None):
    """Fused Parzen MI loss (reference miloss.py:36-57 semantics)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _mi_pallas(I, J, bins, sigma, minVal, maxVal, bool(interpret))
