"""Weight-conversion tests.

The CLIP converter is checked *numerically* against a real torch
``transformers.CLIPTextModel`` (tiny random config, no download): convert its
state dict and compare forward passes token-for-token.  The UNet/VAE
converters are checked structurally by fabricating a diffusers-format
checkpoint for the tiny config and running a full converted forward pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from daam_tpu.models.configs import CLIPTextConfig  # noqa: E402
from daam_tpu.models.clip import CLIPTextEncoder  # noqa: E402
from daam_tpu.models.weights import _convert_clip  # noqa: E402


@pytest.fixture(scope='module')
def hf_clip():
    transformers = pytest.importorskip('transformers')
    cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act='quick_gelu',
        bos_token_id=0, eos_token_id=2)
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(cfg).eval()
    return cfg, model


def test_clip_conversion_numerical_parity(hf_clip):
    cfg, model = hf_clip
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _convert_clip(sd)

    ours_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, hidden_act='quick_gelu')
    enc = CLIPTextEncoder(ours_cfg)

    ids = np.array([[0, 5, 9, 17, 2] + [2] * 72], dtype=np.int32)
    ours, pooled = enc.apply({'params': params}, jnp.asarray(ids),
                             eos_token_id=2)

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids.astype(np.int64)))
    theirs = out.last_hidden_state.numpy()
    theirs_pooled = out.pooler_output.numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), theirs_pooled,
                               rtol=2e-4, atol=2e-4)


def test_clip_conversion_penultimate_matches_hidden_states(hf_clip):
    cfg, model = hf_clip
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _convert_clip(sd)
    ours_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, hidden_act='quick_gelu')
    enc = CLIPTextEncoder(ours_cfg)

    ids = np.array([[0, 7, 3, 2] + [2] * 73], dtype=np.int32)
    pen, _ = enc.apply({'params': params}, jnp.asarray(ids),
                       penultimate=True, eos_token_id=2)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                    output_hidden_states=True)
    # HF hidden_states[-2] is the SDXL conditioning tensor
    theirs = out.hidden_states[-2].numpy()
    np.testing.assert_allclose(np.asarray(pen), theirs, rtol=2e-4, atol=2e-4)


_FILL_POOL = None


def fast_normal_fill(shape, offset, scale=0.02, loc=0.0):
    """Deterministic ~N(loc, scale²) filler at memcpy speed.

    ``rng.standard_normal`` at multi-billion-parameter scale costs 10+ minutes
    on this 1-core host (measured 866 s for the 2.57B-param SDXL fabrication).
    Conversion parity only needs weights that are position-distinguishable —
    so a wrong transpose/permutation in the converter cannot alias — and
    well-scaled; it never compares against stored goldens (torch and Flax both
    consume the *same* fabricated dict).  A 2^24-entry N(0,1) pool is drawn
    once per process and each tensor takes the next (wrapping) window.
    Values repeat with period 2^24, so transposes/permutations within a
    tensor are always caught (stride mismatch), while a hypothetical
    converter bug swapping two same-shape tensors exactly 2^24 elements
    apart would alias — an accepted residual risk of the fast filler."""
    global _FILL_POOL
    if _FILL_POOL is None:
        _FILL_POOL = np.random.default_rng(0).standard_normal(
            1 << 24, dtype=np.float32)
    pool = _FILL_POOL
    n = int(np.prod(shape))
    idx = offset % pool.size
    arr = np.empty(n, np.float32)
    take = min(n, pool.size - idx)
    arr[:take] = pool[idx:idx + take]
    while take < n:                      # wrap: copy exactly n elements
        c = min(pool.size, n - take)
        arr[take:take + c] = pool[:c]
        take += c
    arr = arr.reshape(shape)
    arr *= np.float32(scale)
    if loc:
        arr += np.float32(loc)
    return arr


def _fabricate_unet_checkpoint(config):
    """Random diffusers-format UNet state dict for a config (tiny or real
    geometry; fp32 via the pooled filler — see ``fast_normal_fill``)."""
    sd = {}
    offset = [0]

    def add(name, *shape):
        sd[name] = fast_normal_fill(shape, offset[0])
        offset[0] += int(np.prod(shape))

    cfg = config
    ch = cfg.block_out_channels
    ted = cfg.time_embed_dim
    ctx = cfg.cross_attention_dim

    add('conv_in.weight', ch[0], cfg.in_channels, 3, 3)
    add('conv_in.bias', ch[0])
    add('time_embedding.linear_1.weight', ted, ch[0])
    add('time_embedding.linear_1.bias', ted)
    add('time_embedding.linear_2.weight', ted, ted)
    add('time_embedding.linear_2.bias', ted)
    if cfg.addition_embed_type == 'text_time':
        add('add_embedding.linear_1.weight', ted,
            cfg.projection_class_embeddings_input_dim)
        add('add_embedding.linear_1.bias', ted)
        add('add_embedding.linear_2.weight', ted, ted)
        add('add_embedding.linear_2.bias', ted)

    def resnet(prefix, cin, cout):
        add(prefix + 'norm1.weight', cin); add(prefix + 'norm1.bias', cin)
        add(prefix + 'conv1.weight', cout, cin, 3, 3); add(prefix + 'conv1.bias', cout)
        add(prefix + 'time_emb_proj.weight', cout, ted)
        add(prefix + 'time_emb_proj.bias', cout)
        add(prefix + 'norm2.weight', cout); add(prefix + 'norm2.bias', cout)
        add(prefix + 'conv2.weight', cout, cout, 3, 3); add(prefix + 'conv2.bias', cout)
        if cin != cout:
            add(prefix + 'conv_shortcut.weight', cout, cin, 1, 1)
            add(prefix + 'conv_shortcut.bias', cout)

    def transformer(prefix, c, depth):
        add(prefix + 'norm.weight', c); add(prefix + 'norm.bias', c)
        if cfg.use_linear_projection:
            add(prefix + 'proj_in.weight', c, c)
        else:
            add(prefix + 'proj_in.weight', c, c, 1, 1)
        add(prefix + 'proj_in.bias', c)
        for d in range(depth):
            bp = f'{prefix}transformer_blocks.{d}.'
            for n in ('norm1', 'norm2', 'norm3'):
                add(bp + n + '.weight', c); add(bp + n + '.bias', c)
            for attn, kdim in (('attn1', c), ('attn2', ctx)):
                add(bp + attn + '.to_q.weight', c, c)
                add(bp + attn + '.to_k.weight', c, kdim)
                add(bp + attn + '.to_v.weight', c, kdim)
                add(bp + attn + '.to_out.0.weight', c, c)
                add(bp + attn + '.to_out.0.bias', c)
            add(bp + 'ff.net.0.proj.weight', 8 * c, c)
            add(bp + 'ff.net.0.proj.bias', 8 * c)
            add(bp + 'ff.net.2.weight', c, 4 * c)
            add(bp + 'ff.net.2.bias', c)
        if cfg.use_linear_projection:
            add(prefix + 'proj_out.weight', c, c)
        else:
            add(prefix + 'proj_out.weight', c, c, 1, 1)
        add(prefix + 'proj_out.bias', c)

    n_levels = len(ch)
    for level in range(n_levels):
        cin = ch[level - 1] if level else ch[0]
        for i in range(cfg.layers_per_block):
            resnet(f'down_blocks.{level}.resnets.{i}.', cin if i == 0 else ch[level],
                   ch[level])
            if cfg.down_block_types[level] == 'cross' and \
                    cfg.transformer_layers_per_block[level] > 0:
                transformer(f'down_blocks.{level}.attentions.{i}.', ch[level],
                            cfg.transformer_layers_per_block[level])
        if level < n_levels - 1:
            add(f'down_blocks.{level}.downsamplers.0.conv.weight',
                ch[level], ch[level], 3, 3)
            add(f'down_blocks.{level}.downsamplers.0.conv.bias', ch[level])

    resnet('mid_block.resnets.0.', ch[-1], ch[-1])
    transformer('mid_block.attentions.0.', ch[-1],
                max(cfg.transformer_layers_per_block[-1], 1))
    resnet('mid_block.resnets.1.', ch[-1], ch[-1])

    # up blocks (diffusers order: deepest first); resnet input channels =
    # prev output + skip concat
    skip_chs = [ch[0]]
    for level in range(n_levels):
        for i in range(cfg.layers_per_block):
            skip_chs.append(ch[level])
        if level < n_levels - 1:
            skip_chs.append(ch[level])
    prev = ch[-1]
    for j in range(n_levels):
        level = n_levels - 1 - j
        for i in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            resnet(f'up_blocks.{j}.resnets.{i}.', prev + skip, ch[level])
            prev = ch[level]
            if cfg.up_block_types[level] == 'cross' and \
                    cfg.transformer_layers_per_block[level] > 0:
                transformer(f'up_blocks.{j}.attentions.{i}.', ch[level],
                            cfg.transformer_layers_per_block[level])
        if level > 0:
            add(f'up_blocks.{j}.upsamplers.0.conv.weight', ch[level], ch[level], 3, 3)
            add(f'up_blocks.{j}.upsamplers.0.conv.bias', ch[level])

    add('conv_norm_out.weight', ch[0]); add('conv_norm_out.bias', ch[0])
    add('conv_out.weight', cfg.out_channels, ch[0], 3, 3)
    add('conv_out.bias', cfg.out_channels)
    return sd


def test_unet_conversion_structural():
    """Fabricated diffusers checkpoint converts and runs a forward pass."""
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.models.unet import UNet2DConditionModel
    from daam_tpu.models.weights import _convert_unet

    cfg = get_pipeline_config('tiny').unet
    sd = _fabricate_unet_checkpoint(cfg)
    params = _convert_unet(sd, cfg)
    unet = UNet2DConditionModel(cfg)
    eps, probs = unet.apply({'params': params}, jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,)), jnp.zeros((1, 77, 32)),
                            capture=True)
    assert eps.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(eps)).all()
    assert len(probs) == 4  # 2 up + 1 down + mid


# ---------------------------------------------------------------------------
# numerical parity: torch reference implementations of the diffusers math
# (VERDICT r1: the NHWC/GEGLU/skip-order transposes in _convert_unet /
# _convert_vae are exactly where silent heat-map corruption would hide)
# ---------------------------------------------------------------------------

import math  # noqa: E402

import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class _TResnet(tnn.Module):
    """diffusers ResnetBlock2D (eps per caller; optional time emb)."""

    def __init__(self, cin, cout, groups, ted=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if ted is not None:
            self.time_emb_proj = tnn.Linear(ted, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, 'conv_shortcut') else x
        return sc + h


class _TAttention(tnn.Module):
    def __init__(self, dim, kdim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(kdim, dim, bias=False)
        self.to_v = tnn.Linear(kdim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, L, C = x.shape
        hd = C // self.heads

        def split(t):
            return t.reshape(B, -1, self.heads, hd).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), split(self.to_v(ctx))
        p = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        o = (p @ v).permute(0, 2, 1, 3).reshape(B, L, C)
        return self.to_out[0](o)


class _TFeedForward(tnn.Module):
    """diffusers GEGLU feed-forward (ff.net.0.proj / ff.net.2)."""

    def __init__(self, dim):
        super().__init__()
        proj = tnn.Linear(dim, 8 * dim)
        geglu = tnn.Module()
        geglu.proj = proj
        self.net = tnn.ModuleList([geglu, tnn.Identity(), tnn.Linear(4 * dim, dim)])

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class _TTransformerBlock(tnn.Module):
    def __init__(self, dim, kdim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = _TAttention(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = _TAttention(dim, kdim, heads)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = _TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class _TTransformer2D(tnn.Module):
    def __init__(self, dim, kdim, heads, depth, groups, use_linear):
        super().__init__()
        self.use_linear = use_linear
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = (tnn.Linear(dim, dim) if use_linear
                        else tnn.Conv2d(dim, dim, 1))
        self.transformer_blocks = tnn.ModuleList(
            [_TTransformerBlock(dim, kdim, heads) for _ in range(depth)])
        self.proj_out = (tnn.Linear(dim, dim) if use_linear
                         else tnn.Conv2d(dim, dim, 1))

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h).permute(0, 2, 3, 1).reshape(B, H * W, C)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = self.proj_out(h.reshape(B, H, W, C).permute(0, 3, 1, 2))
        return h + res


def _t_timestep_embedding(t, dim, flip, shift):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin] if flip else [sin, cos], dim=-1)


class _TTinyUNet(tnn.Module):
    """Minimal torch UNet implementing the diffusers forward for our tiny
    config topology, with diffusers parameter names so the fabricated
    checkpoint loads via load_state_dict (strict)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        ted = cfg.time_embed_dim
        ctx = cfg.cross_attention_dim
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(ch[0], ted)
        self.time_embedding.linear_2 = tnn.Linear(ted, ted)
        if cfg.addition_embed_type == 'text_time':
            self.add_embedding = tnn.Module()
            self.add_embedding.linear_1 = tnn.Linear(
                cfg.projection_class_embeddings_input_dim, ted)
            self.add_embedding.linear_2 = tnn.Linear(ted, ted)

        n = len(ch)
        self.down_blocks = tnn.ModuleList()
        for level in range(n):
            blk = tnn.Module()
            cin = ch[level - 1] if level else ch[0]
            blk.resnets = tnn.ModuleList(
                [_TResnet(cin if i == 0 else ch[level], ch[level], g, ted)
                 for i in range(cfg.layers_per_block)])
            if cfg.down_block_types[level] == 'cross':
                blk.attentions = tnn.ModuleList(
                    [_TTransformer2D(ch[level], ctx,
                                     cfg.attention_head_dim[level],
                                     cfg.transformer_layers_per_block[level],
                                     g, cfg.use_linear_projection)
                     for _ in range(cfg.layers_per_block)])
            if level < n - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(ch[level], ch[level], 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([ds])
            self.down_blocks.append(blk)

        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [_TResnet(ch[-1], ch[-1], g, ted), _TResnet(ch[-1], ch[-1], g, ted)])
        self.mid_block.attentions = tnn.ModuleList(
            [_TTransformer2D(ch[-1], ctx, cfg.attention_head_dim[-1],
                             max(cfg.transformer_layers_per_block[-1], 1),
                             g, cfg.use_linear_projection)])

        skip_chs = [ch[0]]
        for level in range(n):
            skip_chs += [ch[level]] * cfg.layers_per_block
            if level < n - 1:
                skip_chs.append(ch[level])
        self.up_blocks = tnn.ModuleList()
        prev = ch[-1]
        self._skips_at_build = list(skip_chs)
        for j in range(n):
            level = n - 1 - j
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            attns = []
            for i in range(cfg.layers_per_block + 1):
                skip = skip_chs.pop()
                blk.resnets.append(_TResnet(prev + skip, ch[level], g, ted))
                prev = ch[level]
                if cfg.up_block_types[level] == 'cross':
                    attns.append(_TTransformer2D(
                        ch[level], ctx, cfg.attention_head_dim[level],
                        cfg.transformer_layers_per_block[level], g,
                        cfg.use_linear_projection))
            if attns:
                blk.attentions = tnn.ModuleList(attns)
            if level > 0:
                us = tnn.Module()
                us.conv = tnn.Conv2d(ch[level], ch[level], 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, ctx, added=None):
        cfg = self.cfg
        temb = _t_timestep_embedding(timesteps, cfg.block_out_channels[0],
                                     cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))
        if cfg.addition_embed_type == 'text_time':
            # diffusers SDXL text_time conditioning: pooled text embedding
            # concat with sinusoidal embeddings of the six micro-cond time ids
            tid = _t_timestep_embedding(added['time_ids'].reshape(-1),
                                        cfg.addition_time_embed_dim,
                                        cfg.flip_sin_to_cos, cfg.freq_shift)
            tid = tid.reshape(sample.shape[0], -1)
            add_emb = torch.cat([added['text_embeds'], tid], dim=-1)
            temb = temb + self.add_embedding.linear_2(
                F.silu(self.add_embedding.linear_1(add_emb)))

        h = self.conv_in(sample)
        skips = [h]
        for level, blk in enumerate(self.down_blocks):
            for i, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, 'attentions'):
                    h = blk.attentions[i](h, ctx)
                skips.append(h)
            if hasattr(blk, 'downsamplers'):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            for i, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, 'attentions'):
                    h = blk.attentions[i](h, ctx)
            if hasattr(blk, 'upsamplers'):
                h = F.interpolate(h, scale_factor=2, mode='nearest')
                h = blk.upsamplers[0].conv(h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


@pytest.mark.parametrize('preset', ['tiny', 'tiny-v1'])
def test_unet_conversion_numerical_parity(preset):
    """Converted Flax UNet forward == torch diffusers-math forward.

    'tiny' covers the SD2 geometry (linear proj_in/out); 'tiny-v1' the SD1.x
    geometry (conv 1×1 projections, uniform head count → per-level head dims,
    reference model registry ``daam/run/generate.py:23-30``)."""
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.models.unet import UNet2DConditionModel
    from daam_tpu.models.weights import _convert_unet

    cfg = get_pipeline_config(preset).unet
    sd = _fabricate_unet_checkpoint(cfg)

    tmodel = _TTinyUNet(cfg)
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()

    rng = np.random.RandomState(42)
    sample = rng.randn(2, 8, 8, cfg.in_channels).astype(np.float32)
    ctx = rng.randn(2, 77, cfg.cross_attention_dim).astype(np.float32)
    t = np.array([500, 10], dtype=np.int32)

    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                        torch.from_numpy(t), torch.from_numpy(ctx))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    params = _convert_unet(sd, cfg)
    unet = UNet2DConditionModel(cfg)
    ours, _ = unet.apply({'params': params}, jnp.asarray(sample),
                         jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=5e-4)


def test_unet_conversion_numerical_parity_sdxl():
    """SDXL geometry: text_time added conditioning (add_embedding), plain
    level-0 blocks, depth-2 transformers — converted Flax forward == torch
    (reference SDXL support: ``daam/run/generate.py:29,197-203``)."""
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.models.unet import UNet2DConditionModel
    from daam_tpu.models.weights import _convert_unet

    cfg = get_pipeline_config('tiny-xl').unet
    sd = _fabricate_unet_checkpoint(cfg)

    tmodel = _TTinyUNet(cfg)
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()

    rng = np.random.RandomState(11)
    sample = rng.randn(2, 8, 8, cfg.in_channels).astype(np.float32)
    ctx = rng.randn(2, 77, cfg.cross_attention_dim).astype(np.float32)
    t = np.array([700, 30], dtype=np.int32)
    pooled_dim = cfg.projection_class_embeddings_input_dim - \
        6 * cfg.addition_time_embed_dim
    text_embeds = rng.randn(2, pooled_dim).astype(np.float32)
    time_ids = np.tile(np.array([16, 16, 0, 0, 16, 16], np.float32), (2, 1))

    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                        torch.from_numpy(t.astype(np.float32)),
                        torch.from_numpy(ctx),
                        added={'text_embeds': torch.from_numpy(text_embeds),
                               'time_ids': torch.from_numpy(time_ids)})
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    params = _convert_unet(sd, cfg)
    unet = UNet2DConditionModel(cfg)
    ours, _ = unet.apply({'params': params}, jnp.asarray(sample),
                         jnp.asarray(t), jnp.asarray(ctx),
                         added_cond={'text_embeds': jnp.asarray(text_embeds),
                                     'time_ids': jnp.asarray(time_ids)})
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=5e-4)


class _TVAEAttn(tnn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        p = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, dim=-1)
        h = self.to_out[0](p @ v)
        return x + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class _TTinyVAEDecoder(tnn.Module):
    """torch reference of the diffusers VAE decoder for our tiny config."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        n = len(ch)
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(cfg.latent_channels, ch[-1], 3, padding=1)
        dec.mid_block = tnn.Module()
        dec.mid_block.resnets = tnn.ModuleList(
            [_TResnet(ch[-1], ch[-1], g, None, eps=1e-6),
             _TResnet(ch[-1], ch[-1], g, None, eps=1e-6)])
        dec.mid_block.attentions = tnn.ModuleList([_TVAEAttn(ch[-1], g)])
        dec.up_blocks = tnn.ModuleList()
        prev = ch[-1]
        for j in range(n):
            level = n - 1 - j
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            for i in range(cfg.layers_per_block + 1):
                blk.resnets.append(_TResnet(prev, ch[level], g, None, eps=1e-6))
                prev = ch[level]
            if level > 0:
                us = tnn.Module()
                us.conv = tnn.Conv2d(ch[level], ch[level], 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = tnn.GroupNorm(g, ch[0], eps=1e-6)
        dec.conv_out = tnn.Conv2d(ch[0], 3, 3, padding=1)
        self.decoder = dec

    def forward(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, 'upsamplers'):
                h = F.interpolate(h, scale_factor=2, mode='nearest')
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


def test_vae_decoder_conversion_numerical_parity():
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.models.vae import AutoencoderKL
    from daam_tpu.models.weights import _convert_vae

    cfg = get_pipeline_config('tiny').vae
    tmodel = _TTinyVAEDecoder(cfg)
    torch.manual_seed(3)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = _convert_vae(sd, cfg)

    rng = np.random.RandomState(7)
    z = rng.randn(1, 8, 8, cfg.latent_channels).astype(np.float32)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    vae = AutoencoderKL(cfg)
    ours = vae.apply({'params': params}, jnp.asarray(z),
                     method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=5e-4)
