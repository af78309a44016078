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


def _fabricate_unet_checkpoint(config):
    """Random diffusers-format UNet state dict for our tiny config."""
    rng = np.random.RandomState(0)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

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
