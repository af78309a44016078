"""Parameter initialization and diffusers-checkpoint conversion.

Two entry points:

* :func:`init_random_params` — randomly initialized parameters at the real
  architecture sizes (benchmarking, tests; no weights are downloadable in an
  air-gapped TPU environment).
* :func:`load_diffusers_checkpoint` — convert a *local* diffusers-format
  model directory (``text_encoder/``, ``unet/``, ``vae/`` with safetensors or
  torch ``.bin`` payloads) into our NHWC flax parameter pytrees.  This is how
  a user of the reference brings their SD 1.5/2.1/SDXL weights across.
"""

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIPTextEncoder
from .configs import MODEL_PRESETS, PipelineConfig, get_pipeline_config
from .unet import UNet2DConditionModel
from .vae import AutoencoderKL

__all__ = ['init_random_params', 'load_diffusers_checkpoint', 'save_params',
           'load_params']


def init_random_params(config: PipelineConfig, seed: int = 0,
                       dtype=jnp.float32) -> Dict[str, Any]:
    """Random params for every module of the pipeline (real architecture).

    Each module's ``init`` is jitted (an eager init dispatches thousands of
    tiny ops — pathological over a remote-TPU tunnel).  For non-fp32 target
    dtypes the init runs on the host CPU backend and only the cast params are
    shipped to the accelerator: initializing fp32 on-device and casting there
    doubles peak memory and fragments the arena (SDXL then OOMs despite
    fitting comfortably in bf16).
    """
    if dtype != jnp.float32:
        return _init_random_params_host(config, seed=seed, dtype=dtype)

    key = jax.random.PRNGKey(seed)
    k_text, k_text2, k_unet, k_vae = jax.random.split(key, 4)

    dummy_ids = jnp.zeros((1, 77), dtype=jnp.int32)
    text = CLIPTextEncoder(config.text, dtype=dtype)
    params = {'text_encoder': jax.jit(text.init)(k_text, dummy_ids)['params']}

    added = None
    if config.is_sdxl:
        text2 = CLIPTextEncoder(config.text_2, dtype=dtype)
        params['text_encoder_2'] = jax.jit(text2.init)(k_text2, dummy_ids)['params']
        pooled_dim = config.text_2.projection_dim or config.text_2.hidden_size
        added = {'text_embeds': jnp.zeros((1, pooled_dim)),
                 'time_ids': jnp.zeros((1, 6))}

    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    s = config.unet.sample_size
    dummy_latents = jnp.zeros((1, s, s, config.unet.in_channels))
    dummy_t = jnp.zeros((1,), dtype=jnp.int32)
    dummy_ctx = jnp.zeros((1, 77, config.unet.cross_attention_dim))
    params['unet'] = jax.jit(
        lambda k, a, b, c: unet.init(k, a, b, c, added_cond=added)
    )(k_unet, dummy_latents, dummy_t, dummy_ctx)['params']

    vae = AutoencoderKL(config.vae, dtype=dtype)
    dummy_z = jnp.zeros((1, s, s, config.vae.latent_channels))
    params['vae'] = jax.jit(
        lambda k, z: vae.init(k, z, method=AutoencoderKL.decode)
    )(k_vae, dummy_z)['params']

    return params


def _init_random_params_host(config: PipelineConfig, seed: int,
                             dtype) -> Dict[str, Any]:
    """Random params built on the host and shipped in the target dtype.

    ``jax.eval_shape`` gives the parameter structure without touching the
    accelerator; leaves are filled with numpy normals and device_put in
    ``dtype``, so device peak memory is exactly the final parameter size.
    (Initializing fp32 on-device and casting doubles the peak and fragments
    the arena — SDXL then OOMs despite fitting comfortably in bf16.)
    """
    key = jax.random.PRNGKey(seed)
    k_text, k_text2, k_unet, k_vae = jax.random.split(key, 4)

    dummy_ids = jnp.zeros((1, 77), dtype=jnp.int32)
    shapes: Dict[str, Any] = {}

    text = CLIPTextEncoder(config.text, dtype=dtype)
    shapes['text_encoder'] = jax.eval_shape(text.init, k_text, dummy_ids)['params']

    added = None
    if config.is_sdxl:
        text2 = CLIPTextEncoder(config.text_2, dtype=dtype)
        shapes['text_encoder_2'] = jax.eval_shape(text2.init, k_text2,
                                                  dummy_ids)['params']
        pooled_dim = config.text_2.projection_dim or config.text_2.hidden_size
        added = {'text_embeds': jnp.zeros((1, pooled_dim)),
                 'time_ids': jnp.zeros((1, 6))}

    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    s = config.unet.sample_size
    shapes['unet'] = jax.eval_shape(
        lambda k, a, b, c: unet.init(k, a, b, c, added_cond=added),
        k_unet, jnp.zeros((1, s, s, config.unet.in_channels)),
        jnp.zeros((1,), dtype=jnp.int32),
        jnp.zeros((1, 77, config.unet.cross_attention_dim)))['params']

    vae = AutoencoderKL(config.vae, dtype=dtype)
    shapes['vae'] = jax.eval_shape(
        lambda k, z: vae.init(k, z, method=AutoencoderKL.decode),
        k_vae, jnp.zeros((1, s, s, config.vae.latent_channels)))['params']

    rng = np.random.RandomState(seed & 0xFFFFFFFF)

    def fill(leaf):
        shape = leaf.shape
        if np.issubdtype(leaf.dtype, np.floating):
            if len(shape) <= 1:
                arr = np.zeros(shape, np.float32)  # biases / norm offsets
            else:
                fan_in = int(np.prod(shape[:-1])) or 1
                arr = rng.normal(0.0, (1.0 / fan_in) ** 0.5,
                                 size=shape).astype(np.float32)
            return jnp.asarray(arr.astype(jax.dtypes.canonicalize_dtype(dtype)))
        return jnp.zeros(shape, leaf.dtype)

    def fill_tree(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = fill_tree(v, path + (k,))
            else:
                name = (path + (k,))[-1]
                if name in ('scale',):  # norm scales start at 1
                    out[k] = jnp.ones(v.shape, dtype)
                else:
                    out[k] = fill(v)
        return out

    return fill_tree(shapes)


# --------------------------------------------------------------------------
# native param checkpointing (convert once, load fast afterwards)
# --------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield '/'.join(prefix + (k,)), v


def save_params(params: Dict[str, Any], path) -> None:
    """Save a parameter pytree as a single .npz (flat slash-joined keys).

    Prefer orbax for sharded/async checkpoints of very large models; this is
    the simple portable format for single-host use."""
    arrays = {k: np.asarray(v) for k, v in _flatten(params)}
    np.savez(path, **arrays)


def load_params(path, dtype=None) -> Dict[str, Any]:
    """Load a pytree saved by :func:`save_params`."""
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for flat_key in data.files:
        node = tree
        parts = flat_key.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = jnp.asarray(data[flat_key])
        if dtype is not None and np.issubdtype(data[flat_key].dtype, np.floating):
            arr = arr.astype(dtype)
        node[parts[-1]] = arr
    return tree


# --------------------------------------------------------------------------
# diffusers-format conversion
# --------------------------------------------------------------------------

def _read_state_dict(module_dir: Path) -> Dict[str, np.ndarray]:
    """Read all tensors of one diffusers submodule directory."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(module_dir.glob('*.safetensors'))
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(str(f), framework='np') as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        return tensors
    bin_files = sorted(module_dir.glob('*.bin'))
    if bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(str(f), map_location='cpu', weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.float().numpy()
        return tensors
    raise FileNotFoundError(f'no safetensors/bin weights in {module_dir}')


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def _assign(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


class _ConsumingDict(dict):
    """Read-once state dict: each tensor is dropped as soon as it is
    converted, so conversion peaks at ~1x the checkpoint size instead of 2x
    (SDXL fp32 is ~10 GB — the difference between fitting comfortably and
    thrashing on a small host).  Membership tests don't consume."""

    def __getitem__(self, k):
        v = super().__getitem__(k)
        del self[k]
        return v


def _take_ownership(sd: Dict[str, np.ndarray], consume: bool):
    """With ``consume=True``, move the entries out of the caller's dict (it
    is emptied) into a read-once view; the caller must not reuse them."""
    if not consume:
        return sd
    moved = _ConsumingDict(sd)
    sd.clear()
    return moved


def _convert_clip(sd: Dict[str, np.ndarray], consume: bool = False) -> Dict:
    """HF CLIPTextModel(WithProjection) state dict -> our CLIPTextEncoder.

    ``consume=True``: see ``_convert_unet``."""
    sd = _take_ownership(sd, consume)
    out: Dict = {}
    pre = 'text_model.'
    _assign(out, ('token_embedding', 'embedding'),
            sd[pre + 'embeddings.token_embedding.weight'])
    out['position_embedding'] = jnp.asarray(
        sd[pre + 'embeddings.position_embedding.weight'])

    n_layers = 0
    while f'{pre}encoder.layers.{n_layers}.self_attn.q_proj.weight' in sd:
        n_layers += 1
    for i in range(n_layers):
        lp = f'{pre}encoder.layers.{i}.'
        base = ('layers_%d' % i,)
        for ours, theirs in [('layer_norm1', 'layer_norm1'),
                             ('layer_norm2', 'layer_norm2')]:
            _assign(out, base + (ours, 'scale'), sd[lp + theirs + '.weight'])
            _assign(out, base + (ours, 'bias'), sd[lp + theirs + '.bias'])
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            _assign(out, base + ('self_attn', proj, 'kernel'),
                    _dense(sd[lp + 'self_attn.' + proj + '.weight']))
            _assign(out, base + ('self_attn', proj, 'bias'),
                    sd[lp + 'self_attn.' + proj + '.bias'])
        for fc in ('fc1', 'fc2'):
            _assign(out, base + (fc, 'kernel'), _dense(sd[lp + 'mlp.' + fc + '.weight']))
            _assign(out, base + (fc, 'bias'), sd[lp + 'mlp.' + fc + '.bias'])

    _assign(out, ('final_layer_norm', 'scale'), sd[pre + 'final_layer_norm.weight'])
    _assign(out, ('final_layer_norm', 'bias'), sd[pre + 'final_layer_norm.bias'])
    if 'text_projection.weight' in sd:
        _assign(out, ('text_projection', 'kernel'), _dense(sd['text_projection.weight']))
    return out


def _convert_resnet(sd, tp, ours_prefix, out):
    _assign(out, ours_prefix + ('norm1', 'scale'), sd[tp + 'norm1.weight'])
    _assign(out, ours_prefix + ('norm1', 'bias'), sd[tp + 'norm1.bias'])
    _assign(out, ours_prefix + ('conv1', 'kernel'), _conv_kernel(sd[tp + 'conv1.weight']))
    _assign(out, ours_prefix + ('conv1', 'bias'), sd[tp + 'conv1.bias'])
    if tp + 'time_emb_proj.weight' in sd:
        _assign(out, ours_prefix + ('time_emb_proj', 'kernel'),
                _dense(sd[tp + 'time_emb_proj.weight']))
        _assign(out, ours_prefix + ('time_emb_proj', 'bias'), sd[tp + 'time_emb_proj.bias'])
    _assign(out, ours_prefix + ('norm2', 'scale'), sd[tp + 'norm2.weight'])
    _assign(out, ours_prefix + ('norm2', 'bias'), sd[tp + 'norm2.bias'])
    _assign(out, ours_prefix + ('conv2', 'kernel'), _conv_kernel(sd[tp + 'conv2.weight']))
    _assign(out, ours_prefix + ('conv2', 'bias'), sd[tp + 'conv2.bias'])
    for sc in ('conv_shortcut', 'nin_shortcut'):
        if tp + sc + '.weight' in sd:
            _assign(out, ours_prefix + ('conv_shortcut', 'kernel'),
                    _conv_kernel(sd[tp + sc + '.weight']))
            _assign(out, ours_prefix + ('conv_shortcut', 'bias'), sd[tp + sc + '.bias'])


def _convert_transformer(sd, tp, ours_prefix, out, use_linear, depth):
    _assign(out, ours_prefix + ('norm', 'scale'), sd[tp + 'norm.weight'])
    _assign(out, ours_prefix + ('norm', 'bias'), sd[tp + 'norm.bias'])
    pi = sd[tp + 'proj_in.weight']
    if use_linear:
        _assign(out, ours_prefix + ('proj_in', 'kernel'), _dense(pi))
    else:
        _assign(out, ours_prefix + ('proj_in', 'kernel'), _conv_kernel(pi))
    _assign(out, ours_prefix + ('proj_in', 'bias'), sd[tp + 'proj_in.bias'])
    for d in range(depth):
        bp = f'{tp}transformer_blocks.{d}.'
        bb = ours_prefix + (f'transformer_blocks_{d}',)
        for norm in ('norm1', 'norm2', 'norm3'):
            _assign(out, bb + (norm, 'scale'), sd[bp + norm + '.weight'])
            _assign(out, bb + (norm, 'bias'), sd[bp + norm + '.bias'])
        for attn in ('attn1', 'attn2'):
            ap = bp + attn + '.'
            ab = bb + (attn,)
            for proj in ('to_q', 'to_k', 'to_v'):
                _assign(out, ab + (proj, 'kernel'), _dense(sd[ap + proj + '.weight']))
            _assign(out, ab + ('to_out', 'kernel'), _dense(sd[ap + 'to_out.0.weight']))
            _assign(out, ab + ('to_out', 'bias'), sd[ap + 'to_out.0.bias'])
        _assign(out, bb + ('ff', 'proj_in', 'kernel'),
                _dense(sd[bp + 'ff.net.0.proj.weight']))
        _assign(out, bb + ('ff', 'proj_in', 'bias'), sd[bp + 'ff.net.0.proj.bias'])
        _assign(out, bb + ('ff', 'proj_out', 'kernel'), _dense(sd[bp + 'ff.net.2.weight']))
        _assign(out, bb + ('ff', 'proj_out', 'bias'), sd[bp + 'ff.net.2.bias'])
    po = sd[tp + 'proj_out.weight']
    if use_linear:
        _assign(out, ours_prefix + ('proj_out', 'kernel'), _dense(po))
    else:
        _assign(out, ours_prefix + ('proj_out', 'kernel'), _conv_kernel(po))
    _assign(out, ours_prefix + ('proj_out', 'bias'), sd[tp + 'proj_out.bias'])


def _convert_unet(sd: Dict[str, np.ndarray], config, consume: bool = False
                  ) -> Dict:
    """diffusers UNet2DConditionModel state dict -> our NHWC UNet pytree.

    Our GEGLU ``FeedForward`` splits the fused projection as (value, gate);
    diffusers' GEGLU does ``hidden, gate = proj(x).chunk(2)`` with the same
    ordering, so the fused kernels map across unchanged.

    ``consume=True`` empties the caller's dict and frees each source tensor
    as it converts (peak memory ~1x checkpoint size instead of 2x — SDXL
    fp32 is ~10 GB).
    """
    sd = _take_ownership(sd, consume)
    out: Dict = {}
    cfg = config
    use_linear = cfg.use_linear_projection

    _assign(out, ('conv_in', 'kernel'), _conv_kernel(sd['conv_in.weight']))
    _assign(out, ('conv_in', 'bias'), sd['conv_in.bias'])
    for ours, theirs in [('time_embedding', 'time_embedding'),
                         ('add_embedding', 'add_embedding')]:
        if theirs + '.linear_1.weight' not in sd:
            continue
        for lin in ('linear_1', 'linear_2'):
            _assign(out, (ours, lin, 'kernel'), _dense(sd[f'{theirs}.{lin}.weight']))
            _assign(out, (ours, lin, 'bias'), sd[f'{theirs}.{lin}.bias'])

    n_levels = len(cfg.block_out_channels)
    # down blocks
    for level in range(n_levels):
        is_cross = cfg.down_block_types[level] == 'cross'
        depth = cfg.transformer_layers_per_block[level]
        for i in range(cfg.layers_per_block):
            tp = f'down_blocks.{level}.resnets.{i}.'
            _convert_resnet(sd, tp, (f'down_{level}_resnet_{i}',), out)
            if is_cross and depth > 0:
                _convert_transformer(sd, f'down_blocks.{level}.attentions.{i}.',
                                     (f'down_{level}_attn_{i}',), out,
                                     use_linear, depth)
        dp = f'down_blocks.{level}.downsamplers.0.conv.'
        if dp + 'weight' in sd:
            _assign(out, (f'down_{level}_downsample', 'conv', 'kernel'),
                    _conv_kernel(sd[dp + 'weight']))
            _assign(out, (f'down_{level}_downsample', 'conv', 'bias'), sd[dp + 'bias'])

    # mid
    _convert_resnet(sd, 'mid_block.resnets.0.', ('mid_resnet_0',), out)
    if cfg.mid_block_attn:
        _convert_transformer(sd, 'mid_block.attentions.0.', ('mid_attn_0',), out,
                             use_linear, max(cfg.transformer_layers_per_block[-1], 1))
    _convert_resnet(sd, 'mid_block.resnets.1.', ('mid_resnet_1',), out)

    # up blocks: diffusers up_blocks[j] runs deepest-first; our naming is by level.
    for j in range(n_levels):
        level = n_levels - 1 - j
        is_cross = cfg.up_block_types[level] == 'cross'
        depth = cfg.transformer_layers_per_block[level]
        for i in range(cfg.layers_per_block + 1):
            tp = f'up_blocks.{j}.resnets.{i}.'
            _convert_resnet(sd, tp, (f'up_{level}_resnet_{i}',), out)
            if is_cross and depth > 0:
                _convert_transformer(sd, f'up_blocks.{j}.attentions.{i}.',
                                     (f'up_{level}_attn_{i}',), out,
                                     use_linear, depth)
        upp = f'up_blocks.{j}.upsamplers.0.conv.'
        if upp + 'weight' in sd:
            _assign(out, (f'up_{level}_upsample', 'conv', 'kernel'),
                    _conv_kernel(sd[upp + 'weight']))
            _assign(out, (f'up_{level}_upsample', 'conv', 'bias'), sd[upp + 'bias'])

    _assign(out, ('conv_norm_out', 'scale'), sd['conv_norm_out.weight'])
    _assign(out, ('conv_norm_out', 'bias'), sd['conv_norm_out.bias'])
    _assign(out, ('conv_out', 'kernel'), _conv_kernel(sd['conv_out.weight']))
    _assign(out, ('conv_out', 'bias'), sd['conv_out.bias'])
    return out


def _convert_vae(sd: Dict[str, np.ndarray], config) -> Dict:
    out: Dict = {}
    n_levels = len(config.block_out_channels)

    def attn_block(src, tp, dst, ours):
        """Convert one VAE mid-block attention (handles both diffusers
        namings: to_q/to_k/to_v/to_out.0 and query/key/value/proj_attn)."""
        _assign(dst, ours + ('group_norm', 'scale'), src[tp + 'group_norm.weight'])
        _assign(dst, ours + ('group_norm', 'bias'), src[tp + 'group_norm.bias'])
        names = [('to_q', 'to_q'), ('to_k', 'to_k'), ('to_v', 'to_v'),
                 ('to_out', 'to_out.0')]
        if tp + 'query.weight' in src:
            names = [('to_q', 'query'), ('to_k', 'key'), ('to_v', 'value'),
                     ('to_out', 'proj_attn')]
        for ours_n, theirs_n in names:
            w = src[tp + theirs_n + '.weight']
            if w.ndim == 4:
                w = w[:, :, 0, 0]
            _assign(dst, ours + (ours_n, 'kernel'), _dense(w))
            _assign(dst, ours + (ours_n, 'bias'), src[tp + theirs_n + '.bias'])

    # encoder
    enc: Dict[str, np.ndarray] = {k[len('encoder.'):]: v for k, v in sd.items()
                                  if k.startswith('encoder.')}
    if enc:
        e: Dict = {}
        _assign(e, ('conv_in', 'kernel'), _conv_kernel(enc['conv_in.weight']))
        _assign(e, ('conv_in', 'bias'), enc['conv_in.bias'])
        for level in range(n_levels):
            for i in range(config.layers_per_block):
                _convert_resnet(enc, f'down_blocks.{level}.resnets.{i}.',
                                (f'down_{level}_resnet_{i}',), e)
            dp = f'down_blocks.{level}.downsamplers.0.conv.'
            if dp + 'weight' in enc:
                _assign(e, (f'down_{level}_downsample', 'kernel'),
                        _conv_kernel(enc[dp + 'weight']))
                _assign(e, (f'down_{level}_downsample', 'bias'), enc[dp + 'bias'])
        _convert_resnet(enc, 'mid_block.resnets.0.', ('mid_resnet_0',), e)
        attn_block(enc, 'mid_block.attentions.0.', e, ('mid_attn',))
        _convert_resnet(enc, 'mid_block.resnets.1.', ('mid_resnet_1',), e)
        _assign(e, ('conv_norm_out', 'scale'), enc['conv_norm_out.weight'])
        _assign(e, ('conv_norm_out', 'bias'), enc['conv_norm_out.bias'])
        _assign(e, ('conv_out', 'kernel'), _conv_kernel(enc['conv_out.weight']))
        _assign(e, ('conv_out', 'bias'), enc['conv_out.bias'])
        _assign(e, ('quant_conv', 'kernel'), _conv_kernel(sd['quant_conv.weight']))
        _assign(e, ('quant_conv', 'bias'), sd['quant_conv.bias'])
        out['encoder'] = e

    # decoder
    dec: Dict[str, np.ndarray] = {k[len('decoder.'):]: v for k, v in sd.items()
                                  if k.startswith('decoder.')}
    d: Dict = {}
    _assign(d, ('post_quant_conv', 'kernel'), _conv_kernel(sd['post_quant_conv.weight']))
    _assign(d, ('post_quant_conv', 'bias'), sd['post_quant_conv.bias'])
    _assign(d, ('conv_in', 'kernel'), _conv_kernel(dec['conv_in.weight']))
    _assign(d, ('conv_in', 'bias'), dec['conv_in.bias'])
    _convert_resnet(dec, 'mid_block.resnets.0.', ('mid_resnet_0',), d)
    attn_block(dec, 'mid_block.attentions.0.', d, ('mid_attn',))
    _convert_resnet(dec, 'mid_block.resnets.1.', ('mid_resnet_1',), d)
    # diffusers decoder up_blocks[j]: deepest-first.
    for j in range(n_levels):
        level = n_levels - 1 - j
        for i in range(config.layers_per_block + 1):
            _convert_resnet(dec, f'up_blocks.{j}.resnets.{i}.',
                            (f'up_{level}_resnet_{i}',), d)
        upp = f'up_blocks.{j}.upsamplers.0.conv.'
        if upp + 'weight' in dec:
            _assign(d, (f'up_{level}_upsample', 'kernel'),
                    _conv_kernel(dec[upp + 'weight']))
            _assign(d, (f'up_{level}_upsample', 'bias'), dec[upp + 'bias'])
    _assign(d, ('conv_norm_out', 'scale'), dec['conv_norm_out.weight'])
    _assign(d, ('conv_norm_out', 'bias'), dec['conv_norm_out.bias'])
    _assign(d, ('conv_out', 'kernel'), _conv_kernel(dec['conv_out.weight']))
    _assign(d, ('conv_out', 'bias'), dec['conv_out.bias'])
    out['decoder'] = d
    return out


def _clip_config_from_json(cfg: dict) -> 'CLIPTextConfig':
    from .configs import CLIPTextConfig
    with_proj = any('WithProjection' in a
                    for a in (cfg.get('architectures') or []))
    return CLIPTextConfig(
        vocab_size=cfg.get('vocab_size', 49408),
        hidden_size=cfg.get('hidden_size', 768),
        intermediate_size=cfg.get('intermediate_size', 3072),
        num_hidden_layers=cfg.get('num_hidden_layers', 12),
        num_attention_heads=cfg.get('num_attention_heads', 12),
        max_position_embeddings=cfg.get('max_position_embeddings', 77),
        hidden_act=cfg.get('hidden_act', 'quick_gelu'),
        layer_norm_eps=cfg.get('layer_norm_eps', 1e-5),
        projection_dim=cfg.get('projection_dim') if with_proj else None)


def _config_from_json(path: Path) -> PipelineConfig:
    """Derive a :class:`PipelineConfig` from the checkpoint's own
    ``config.json`` files, the way diffusers instantiates arbitrary
    geometries (the reference inherits that via ``from_pretrained``,
    ``daam/run/generate.py:197-207``).  Checkpoints matching a known preset
    return the preset object itself (its name and generation defaults)."""
    import json
    from .configs import UNetConfig, VAEConfig

    u = json.loads((path / 'unet' / 'config.json').read_text())
    n = len(u['block_out_channels'])
    down = tuple('cross' if 'CrossAttn' in t else 'plain'
                 for t in u['down_block_types'])
    # diffusers up_block_types is in traversal order (deepest level first);
    # ours is per resolution level (finest first)
    up = tuple('cross' if 'CrossAttn' in t else 'plain'
               for t in reversed(u['up_block_types']))
    heads = u.get('attention_head_dim', 8)
    heads = tuple(heads) if isinstance(heads, list) else (heads,) * n
    tl = u.get('transformer_layers_per_block', 1)
    tl = tuple(tl) if isinstance(tl, list) else (tl,) * n
    tl = tuple(t if d == 'cross' else 0 for t, d in zip(tl, down))
    unet = UNetConfig(
        sample_size=u.get('sample_size', 64),
        in_channels=u.get('in_channels', 4),
        out_channels=u.get('out_channels', 4),
        block_out_channels=tuple(u['block_out_channels']),
        down_block_types=down,
        up_block_types=up,
        layers_per_block=u.get('layers_per_block', 2),
        attention_head_dim=heads,
        transformer_layers_per_block=tl,
        cross_attention_dim=u.get('cross_attention_dim', 768),
        use_linear_projection=u.get('use_linear_projection', False),
        norm_num_groups=u.get('norm_num_groups', 32),
        freq_shift=u.get('freq_shift', 0),
        flip_sin_to_cos=u.get('flip_sin_to_cos', True),
        mid_block_attn='CrossAttn' in (u.get('mid_block_type')
                                       or 'UNetMidBlock2DCrossAttn'),
        addition_embed_type=u.get('addition_embed_type'),
        addition_time_embed_dim=u.get('addition_time_embed_dim', 256),
        projection_class_embeddings_input_dim=u.get(
            'projection_class_embeddings_input_dim'))

    text = _clip_config_from_json(
        json.loads((path / 'text_encoder' / 'config.json').read_text()))
    text_2 = None
    if (path / 'text_encoder_2').exists():
        text_2 = _clip_config_from_json(json.loads(
            (path / 'text_encoder_2' / 'config.json').read_text()))

    v = json.loads((path / 'vae' / 'config.json').read_text())
    vae = VAEConfig(
        in_channels=v.get('in_channels', 3),
        out_channels=v.get('out_channels', 3),
        latent_channels=v.get('latent_channels', 4),
        block_out_channels=tuple(v.get('block_out_channels',
                                       (128, 256, 512, 512))),
        layers_per_block=v.get('layers_per_block', 2),
        norm_num_groups=v.get('norm_num_groups', 32),
        sample_size=v.get('sample_size', 512),
        scaling_factor=v.get('scaling_factor', 0.18215))

    prediction_type = 'epsilon'
    sched = path / 'scheduler' / 'scheduler_config.json'
    if sched.exists():
        prediction_type = json.loads(sched.read_text()).get(
            'prediction_type', 'epsilon')

    def _norm(ucfg):
        # transformer depth on plain (non-cross) levels is unused by the
        # model; zero it so preset comparison ignores the convention
        # difference (presets write 1, diffusers json may write either)
        from dataclasses import replace
        return replace(ucfg, transformer_layers_per_block=tuple(
            t if d == 'cross' else 0
            for t, d in zip(ucfg.transformer_layers_per_block,
                            ucfg.down_block_types)))

    # SD 2.1 and 2.0 are architecture-identical (they differ only in
    # weights); prefer the 2.1 presets so the resolved name matches what
    # the historical heuristic reported for these geometries
    preferred = ('v2-1-base', 'v2-1-large')
    candidates = [*preferred,
                  *(nm for nm in MODEL_PRESETS if nm not in preferred)]
    for preset_name in candidates:
        preset = get_pipeline_config(preset_name)
        if (_norm(preset.unet) == _norm(unet) and preset.text == text
                and preset.text_2 == text_2 and preset.vae == vae
                and preset.prediction_type == prediction_type):
            return preset
    return PipelineConfig(name=path.name, text=text, text_2=text_2,
                          unet=unet, vae=vae,
                          prediction_type=prediction_type,
                          is_sdxl=text_2 is not None)


def _detect_config(path: Path) -> PipelineConfig:
    """Config for a local diffusers dir: derived from its json configs when
    they are all present, else the historical geometry heuristic."""
    import json
    try:
        return _config_from_json(path)
    except (OSError, KeyError, ValueError, TypeError):
        # missing or malformed per-module config.json (JSONDecodeError is a
        # ValueError): fall back to the geometry heuristic that only needs
        # the unet config — dirs that loaded before keep loading
        pass
    unet_cfg = json.loads((path / 'unet' / 'config.json').read_text())
    cross_dim = unet_cfg.get('cross_attention_dim', 768)
    sample = unet_cfg.get('sample_size', 64)
    if (path / 'text_encoder_2').exists():
        return get_pipeline_config('xl-base-1.0')
    if cross_dim == 768:
        return get_pipeline_config('v1')
    if sample == 96:
        return get_pipeline_config('v2-1-large')
    return get_pipeline_config('v2-1-base')


def load_diffusers_checkpoint(path, dtype=jnp.float32
                              ) -> Tuple[PipelineConfig, Dict[str, Any], Any]:
    """Convert a local diffusers model dir into (config, params, tokenizer)."""
    from ..tokenization import default_tokenizer
    from ..utils import ensure_hugepages

    ensure_hugepages()   # multi-GB first-touch is fault-bound without THP
    # (no-op unless the process opted in with DAAM_THP=1 — see utils)
    path = Path(path)
    config = _detect_config(path)
    params: Dict[str, Any] = {}
    params['text_encoder'] = _convert_clip(
        _read_state_dict(path / 'text_encoder'), consume=True)
    if config.is_sdxl:
        params['text_encoder_2'] = _convert_clip(
            _read_state_dict(path / 'text_encoder_2'), consume=True)
    params['unet'] = _convert_unet(_read_state_dict(path / 'unet'),
                                   config.unet, consume=True)
    params['vae'] = _convert_vae(_read_state_dict(path / 'vae'), config.vae)
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    tokenizer = default_tokenizer(path)
    return config, params, tokenizer
