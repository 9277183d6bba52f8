"""Cross-modality synthesis GAN: spectral-norm U-Net generator + patch
discriminator with a hinge-style loss.

Re-implementation of the reference gan.py:
  * `Conv` blocks are pre-activation: norm -> act -> spectral_norm(conv3x3),
    xavier-normal init (gan.py:10-27).
  * NetG (gan.py:76-118): recursively nested concat-skip U-Net,
    stride-2 conv down / nearest-upsample up, BatchNorm.
  * NetD (gan.py:120-139): norm-free conv stack with avg-pool downsampling,
    ending in a 1-channel patch map.
  * loss_gan (gan.py:141-147): D: mean(clamp(-/+pred, min=-1)); G: mean(-pred).

Spectral normalization uses power iteration with state in 'batch_stats'
(pass update_stats=train), mirroring torch's one-step-per-forward behavior.
NHWC throughout; NCHW at the public module boundary.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import avg_pool2, upsample_nearest2, nchw_to_nhwc, nhwc_to_nchw


def _l2_normalize(x, eps=1e-12):
    return x / (jnp.linalg.norm(x) + eps)


class SpectralConv(nn.Module):
    """Conv2d under spectral normalization with torch-exact semantics
    (torch.nn.utils.spectral_norm): u and v singular-vector estimates are
    stored state; training forwards run `n_steps` power iterations
    (updating u, v) BEFORE computing sigma = u . W_mat . v; eval forwards
    use the stored vectors unchanged. Gradients flow through sigma (u, v
    detached). W_mat is the kernel in torch layout [out, in*kh*kw] so
    reference checkpoints cross-load bit-for-bit.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    n_steps: int = 1
    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        out = self.features
        kernel = self.param(
            "kernel", nn.initializers.xavier_normal(), (kh, kw, in_ch, out)
        )
        bias = self.param("bias", nn.initializers.zeros, (out,))
        k_dim = in_ch * kh * kw

        # torch weight layout [out, in, kh, kw] flattened to [out, K]
        w_mat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(out, k_dim)

        def _init_vec(key, n):
            return _l2_normalize(jax.random.normal(key, (n,)), self.eps)

        u_var = self.variable(
            "batch_stats", "u", lambda: _init_vec(self.make_rng("params"), out)
        )
        v_var = self.variable(
            "batch_stats", "v", lambda: _init_vec(self.make_rng("params"), k_dim)
        )
        u, v = u_var.value, v_var.value
        if update_stats and not self.is_initializing():
            for _ in range(self.n_steps):
                v = _l2_normalize(w_mat.T @ u, self.eps)
                u = _l2_normalize(w_mat @ v, self.eps)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            u_var.value = u
            v_var.value = v
        sigma = jnp.dot(u, w_mat @ v)
        w = (kernel / sigma).astype(self.dtype)

        pad = kh // 2 if self.strides[0] == 1 else 0
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w,
            window_strides=tuple(self.strides),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class SNConv(nn.Module):
    """[BatchNorm ->] act -> spectral_norm(conv), xavier-normal init."""

    out_chans: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    use_norm: bool = True
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        x = nn.relu(x) if self.act == "relu" else nn.leaky_relu(x, 0.01)
        return SpectralConv(
            self.out_chans, self.kernel, self.strides, dtype=self.dtype
        )(x, update_stats=train)


class NetG(nn.Module):
    """Spectral-norm synthesis U-Net (gan.py:76-118).

    layers e.g. (64, 128, 256, 512, 512); in/out 1 channel (model.py:58-59).
    Accepts NCHW real input.
    """

    out_chans: int = 1
    layers: Sequence[int] = (64, 128, 256, 512, 512)
    dtype: Any = jnp.float32

    def _conv(self, x, ch, train):
        return SNConv(ch, dtype=self.dtype)(x, train)

    def _down(self, x, ch, train):
        return SNConv(ch, kernel=(2, 2), strides=(2, 2), dtype=self.dtype)(x, train)

    def _res(self, x, ch, n, train):
        y = x
        for _ in range(n):
            y = self._conv(y, ch, train)
        return x + y

    def _inner(self, x, depth, train):
        layers = list(self.layers)
        cur = layers[depth]
        y = self._down(x, cur, train)
        y = self._res(y, cur, 2, train)
        if depth < len(layers) - 1:
            y = self._inner(y, depth + 1, train)
            y = self._conv(y, cur, train)
            y = self._res(y, cur, 1, train)
        y = upsample_nearest2(y)
        return jnp.concatenate([y, x], axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nchw_to_nhwc(x)
        l0 = self.layers[0]
        x = self._conv(x, l0, train)
        x = self._res(x, l0, 1, train)
        x = self._inner(x, 1, train)
        x = self._conv(x, l0, train)
        x = self._res(x, l0, 1, train)
        x = self._conv(x, self.out_chans, train)
        return nhwc_to_nchw(x)


class NetD(nn.Module):
    """Norm-free spectral-norm patch discriminator (gan.py:120-139).

    blocks e.g. ([64]*2, [128]*2, [256]*2, [256]*2, [256]*2)
    (model.py:60-61); each block is a conv stack followed by 2x2 avg-pool,
    with the final pool replaced by a 1-channel conv. NCHW in/out.
    """

    blocks: Sequence[Sequence[int]] = ((64,) * 2, (128,) * 2, (256,) * 2,
                                       (256,) * 2, (256,) * 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nchw_to_nhwc(x)
        blocks = [list(b) for b in self.blocks]
        for bi, block in enumerate(blocks):
            for ch in block:
                x = SNConv(ch, use_norm=False, dtype=self.dtype)(x, train)
            if bi < len(blocks) - 1:
                x = avg_pool2(x)
            else:
                # last block's pool is replaced by the 1-channel head
                x = SNConv(1, use_norm=False, dtype=self.dtype)(x, train)
        return nhwc_to_nchw(x)


def loss_gan(predict: jnp.ndarray, real: bool = True, D_loss: bool = True):
    """Hinge-style GAN loss (gan.py:141-147)."""
    assert not (real and not D_loss), "are you sure?"
    if D_loss:
        loss = jnp.clip(-predict if real else predict, min=-1.0)
    else:
        loss = predict if real else -predict
    return jnp.mean(loss)
