"""Flax AutoencoderKL (VAE) — encoder/decoder between pixels and latents.

From-scratch NHWC implementation of the SD VAE.  The decoder is the hot path
(every generation ends with one decode); the encoder supports img2img-style
workflows and experiment reconstruction.  Mid-block spatial attention uses the
shared attention op (single head over h*w tokens, as in SD's VAE).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import VAEConfig

__all__ = ['AutoencoderKL', 'DiagonalGaussian']


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name='norm1')(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv1')(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name='norm2')(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv2')(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head spatial self-attention (SD VAE mid-block style)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name='group_norm')(x).astype(self.dtype)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name='to_q')(h)
        k = nn.Dense(C, dtype=self.dtype, name='to_k')(h)
        v = nn.Dense(C, dtype=self.dtype, name='to_v')(h)
        scores = jnp.einsum('bqc,bkc->bqk', q, k) * (C ** -0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        h = jnp.einsum('bqk,bkc->bqc', probs, v)
        h = nn.Dense(C, dtype=self.dtype, name='to_out')(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv_in')(x.astype(self.dtype))
        for level, ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.layers_per_block):
                h = VAEResnetBlock(ch, groups=g, dtype=self.dtype,
                                   name=f'down_{level}_resnet_{i}')(h)
            if level < len(cfg.block_out_channels) - 1:
                # torch uses asymmetric (0,1) padding for VAE downsampling
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding='VALID',
                            dtype=self.dtype, name=f'down_{level}_downsample')(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name='mid_resnet_0')(h)
        h = VAEAttentionBlock(groups=g, dtype=self.dtype, name='mid_attn')(h)
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name='mid_resnet_1')(h)
        h = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name='conv_norm_out')(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name='conv_out')(h)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                       name='quant_conv')(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name='post_quant_conv')(z.astype(self.dtype))
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name='conv_in')(z)
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name='mid_resnet_0')(h)
        h = VAEAttentionBlock(groups=g, dtype=self.dtype, name='mid_attn')(h)
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name='mid_resnet_1')(h)

        for level in reversed(range(len(cfg.block_out_channels))):
            ch = cfg.block_out_channels[level]
            for i in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(ch, groups=g, dtype=self.dtype,
                                   name=f'up_{level}_resnet_{i}')(h)
            if level > 0:
                B, H, W, C = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f'up_{level}_upsample')(h)

        h = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name='conv_norm_out')(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=jnp.float32, name='conv_out')(h)


class DiagonalGaussian:
    """Posterior q(z|x) from the encoder's (mean, logvar) output."""

    def __init__(self, params: jnp.ndarray):
        self.mean, logvar = jnp.split(params, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape)

    def mode(self) -> jnp.ndarray:
        return self.mean


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)

    def encode(self, x) -> DiagonalGaussian:
        return DiagonalGaussian(self.encoder(x))

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(z)

    def __call__(self, x, key):
        post = self.encode(x)
        return self.decode(post.sample(key))
