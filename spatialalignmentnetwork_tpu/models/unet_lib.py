"""Generic recursive U-Net family (BN + LeakyReLU flavour).

Re-implementation of the reference's second U-Net library (unet.py:119-189):
a recursively nested encoder/decoder where every level contributes a concat
skip (CatSequential), residual conv stacks (ResSequential), avg-pool + 1x1
conv downsampling and nearest-upsample + 1x1 conv upsampling, all with
BatchNorm + LeakyReLU. Used by the spatial-alignment network (cross.py:12-15).

Also provides the plain ResNet factory (unet.py:204-224).

NHWC throughout; BatchNorm running statistics live in the 'batch_stats'
collection (pass train=True to update them).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import avg_pool2, upsample_nearest2


class LibUNet(nn.Module):
    """UNet(in, out, layers) with the reference's recursive topology.

    layers: channel widths per level, e.g. (32, 64, 64, 64, 64).
    """

    out_chans: int
    layers: Sequence[int]
    dtype: Any = jnp.float32

    def _bn(self, x, train):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)

    def _conv_bn_act(self, x, out_ch, train, kernel=(3, 3)):
        """conv -> BN -> LeakyReLU(0.01) (reference unet.py Conv2d/Up/Down)."""
        x = nn.Conv(out_ch, kernel, padding=kernel[0] // 2, dtype=self.dtype)(x)
        x = self._bn(x, train)
        return nn.leaky_relu(x, negative_slope=0.01)

    def _res(self, x, ch, n_convs, train):
        """x + (conv_bn_act)^n(x)."""
        y = x
        for _ in range(n_convs):
            y = self._conv_bn_act(y, ch, train)
        return x + y

    def _down(self, x, out_ch, train):
        return self._conv_bn_act(avg_pool2(x), out_ch, train, kernel=(1, 1))

    def _up(self, x, out_ch, train):
        return self._conv_bn_act(upsample_nearest2(x), out_ch, train, kernel=(1, 1))

    def _inner(self, x, depth, train):
        """Nested level `depth` (1-based): returns cat([f(x), x], channel)."""
        layers = list(self.layers)
        cur, upper = layers[depth], layers[depth - 1]
        y = self._down(x, cur, train)
        y = self._res(y, cur, 2, train)
        if depth < len(layers) - 1:
            y = self._inner(y, depth + 1, train)
            y = self._conv_bn_act(y, cur, train)
            y = self._res(y, cur, 1, train)
        y = self._up(y, cur, train)
        return jnp.concatenate([y, x], axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = True):
        l0 = self.layers[0]
        x = self._conv_bn_act(x, l0, train)
        x = self._res(x, l0, 1, train)
        x = self._inner(x, 1, train)
        x = self._conv_bn_act(x, l0, train)
        x = self._res(x, l0, 1, train)
        # final plain conv3x3 (no BN/act)
        return nn.Conv(self.out_chans, (3, 3), padding=1, dtype=self.dtype)(x)


class Encoder(nn.Module):
    """Feature-pyramid encoder (reference unet.py:33-72): conv+LeakyReLU
    stem and residual blocks per level with avg-pool downsampling; returns
    the per-level feature list (norm-free, matching the reference default)."""

    layers: Sequence[int]
    dtype: Any = jnp.float32

    def _cna(self, x, ch):
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01)

    def _res(self, x, ch, n=2):
        y = x
        for _ in range(n):
            y = self._cna(y, ch)
        return x + y

    @nn.compact
    def __call__(self, x):
        feats = []
        chs = list(self.layers)
        x = self._cna(x, chs[0])
        x = self._res(x, chs[0])
        feats.append(x)
        for ch in chs[1:-1]:
            x = avg_pool2(x)
            x = self._cna(x, ch)
            x = self._res(x, ch)
            feats.append(x)
        x = avg_pool2(x)
        x = self._cna(x, chs[-1])
        feats.append(x)
        return feats


class Decoder(nn.Module):
    """Bridged decoder (reference unet.py:74-117): consumes an encoder's
    feature list deepest-first, concatenating each bridge before its level."""

    out_chans: int
    layers: Sequence[int]
    bridges: Sequence[int]
    dtype: Any = jnp.float32

    def _cna(self, x, ch):
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01)

    def _res(self, x, ch, n=2):
        y = x
        for _ in range(n):
            y = self._cna(y, ch)
        return x + y

    @nn.compact
    def __call__(self, bridges):
        layers = list(self.layers)
        assert len(layers) == len(self.bridges)
        x = None
        for i, bridge in enumerate(reversed(bridges)):
            level = len(layers) - 1 - i
            ch = layers[level]
            x = bridge if x is None else jnp.concatenate([x, bridge], axis=-1)
            x = self._cna(x, ch)
            x = self._res(x, ch)
            if level > 0:
                x = upsample_nearest2(x)
            else:
                x = nn.Conv(self.out_chans, (3, 3), padding=1,
                            dtype=self.dtype)(x)
        return x


class ResNet(nn.Module):
    """Plain conv ResNet factory (reference unet.py:204-224).

    conv3x3(in->c0) [-> big residual] -> LeakyReLU -> conv3x3(c_last->out),
    where the middle is a chain of two-conv residual blocks with 1x1-conv
    shortcuts on channel changes.
    """

    out_chans: int
    channels: Sequence[int] = (64, 64, 64, 64)
    res: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chs = list(self.channels)
        x = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype)(x)
        mid_in = x
        for last, cur in zip(chs[:-1], chs[1:]):
            y = nn.leaky_relu(x, 0.01)
            z = nn.Conv(cur, (3, 3), padding=1, dtype=self.dtype)(y)
            z = nn.leaky_relu(z, 0.01)
            z = nn.Conv(cur, (3, 3), padding=1, dtype=self.dtype)(z)
            sc = y if last == cur else nn.Conv(cur, (1, 1), dtype=self.dtype)(y)
            x = sc + z
        if self.res:
            sc = (
                mid_in
                if chs[0] == chs[-1]
                else nn.Conv(chs[-1], (1, 1), dtype=self.dtype)(mid_in)
            )
            x = sc + x
        x = nn.leaky_relu(x, 0.01)
        return nn.Conv(self.out_chans, (3, 3), padding=1, dtype=self.dtype)(x)
