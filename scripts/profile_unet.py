"""Micro-profile the UNet denoise step on the current backend.

Times, at the flagship SD2.1-base shapes: one UNet apply (CFG batch 2), with
and without capture, plus a few ablations (GroupNorm dtype, kernel mode) to
attribute per-step time.  Run on the real chip:

    python scripts/profile_unet.py [--model v2-1-base] [--reps 20]
"""

import argparse
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp


def _sync(out):
    """True barrier: fetch one scalar to host.  Over the remote-TPU relay,
    ``block_until_ready`` resolves before execution completes — only a
    device→host read actually waits."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench_fn(fn, args_list, reps=None):
    """Amortized time per call over distinct inputs, host-fetch synced.
    Distinct inputs defeat any memoization of identical repeated programs."""
    _sync(fn(*args_list[0]))
    t0 = time.perf_counter()
    out = None
    for args in args_list[1:]:
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / (len(args_list) - 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', default='v2-1-base')
    parser.add_argument('--reps', type=int, default=20)
    parser.add_argument('--dtype', default='bfloat16')
    args = parser.parse_args()

    from daam_tpu.models import weights as W
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.models.unet import UNet2DConditionModel
    from daam_tpu.models.vae import AutoencoderKL
    from daam_tpu.ops import attention as attn_mod

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    config = get_pipeline_config(args.model)
    print(f'backend={jax.default_backend()} model={args.model} dtype={args.dtype}')

    params = W.init_random_params(config, seed=0, dtype=dtype)
    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    s = config.unet.sample_size
    B = 2
    key = jax.random.PRNGKey(0)
    n_inputs = args.reps + 1

    added = None
    if config.is_sdxl:
        pooled_dim = config.text_2.projection_dim or config.text_2.hidden_size
        added = {'text_embeds': jnp.zeros((B, pooled_dim)),
                 'time_ids': jnp.zeros((B, 6))}

    def inputs_for(i):
        k = jax.random.fold_in(key, i)
        latents = jax.random.normal(k, (B, s, s, 4), dtype=jnp.float32)
        t = jnp.full((B,), 500 - i)
        ctx = jax.random.normal(jax.random.fold_in(k, 1),
                                (B, 77, config.unet.cross_attention_dim),
                                dtype=jnp.float32) * 0.1
        return latents, t, ctx

    all_inputs = [inputs_for(i) for i in range(n_inputs)]
    jax.block_until_ready(all_inputs)

    @jax.jit
    def step_plain(p, x, tt, c):
        return unet.apply({'params': p}, x, tt, c, added_cond=added)[0]

    @jax.jit
    def step_capture(p, x, tt, c):
        eps, probs = unet.apply({'params': p}, x, tt, c, added_cond=added, capture='cond')
        return eps, probs

    arglists = [(params['unet'],) + inp for inp in all_inputs]
    t_plain = bench_fn(step_plain, arglists)
    print(f'unet plain      : {t_plain * 1e3:8.2f} ms')

    t_cap = bench_fn(step_capture, arglists)
    print(f'unet capture    : {t_cap * 1e3:8.2f} ms  '
          f'(+{(t_cap / t_plain - 1) * 100:.1f}%)')

    # kernel-mode ablation: force jnp attention
    attn_mod.set_kernel_mode('jnp')

    @jax.jit
    def step_jnp(p, x, tt, c):
        return unet.apply({'params': p}, x, tt, c, added_cond=added)[0]

    t_jnp = bench_fn(step_jnp, arglists)
    print(f'unet jnp attn   : {t_jnp * 1e3:8.2f} ms  '
          f'(pallas speedup {t_jnp / t_plain:.2f}x)')
    attn_mod.set_kernel_mode('auto')

    # VAE decode
    vae = AutoencoderKL(config.vae, dtype=dtype)

    @jax.jit
    def decode(p, z):
        return vae.apply({'params': p}, z, method=AutoencoderKL.decode)

    dec_args = [(params['vae'], inp[0][:1]) for inp in all_inputs]
    t_dec = bench_fn(decode, dec_args)
    print(f'vae decode      : {t_dec * 1e3:8.2f} ms')

    # crude FLOP estimate for context: SD2.1 UNet fwd ~0.7 TFLOP, CFG batch 2
    est = 1.4e12
    print(f'implied MXU util: {est / t_plain / 394e12 * 100:.1f}% '
          f'(assuming ~1.4 TFLOP/step CFG pair, v5e peak 394 TF/s bf16)')


if __name__ == '__main__':
    main()
