"""Ablate the odd-head ghost-head packed path on the SD2.1 UNet step.

Measures the per-step time of the v2-1-base UNet (CFG batch 2, bf16) with
(a) odd 5-head levels run packed via one zero ghost head
(``ops.attention.packed_ghost_heads`` under ``set_odd_packed(True)``) and
(b) odd head counts on the head-major fallback (the shipping default,
4 relayout copies per odd-head attention).

Both variants are compiled up front and timed in alternating blocks so
relay/session drift cancels; per-variant device time comes from the same
xplane HLO-self-time extraction bench.py uses (``measure_device_time``).

Verdict (real chip, 2026-08-19, v2-1-base): NEGATIVE — ghost-head packing
is slower.  Wall medians packed 21.17 vs fallback 21.06 ms/step (0.995x);
HLO device self-time packed 17.17 vs fallback 16.95 ms/step (-0.22 ms,
0.987x).  The sixth 64-lane ghost slice costs more MXU/VMEM work than the
deleted relayout copies saved on a 5-head level.  Odd counts therefore
default to head-major (``packed_eligible``); the packed form stays opt-in.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ghost_head.py
"""

import argparse
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def time_block(fn, args_list):
    """Wall seconds per call over one pass of args_list (pre-warmed fn)."""
    t0 = time.perf_counter()
    out = None
    for args in args_list:
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / len(args_list)


def build_step(model: str, odd_packed: bool):
    """Compile the UNet step with odd-head packing on/off.

    ``packed_eligible`` is consulted at trace time only, so flipping
    ``set_odd_packed`` while jit traces bakes the chosen attention layout
    into the compiled program; the toggle can be restored immediately after.
    """
    from daam_tpu.models import unet as unet_mod
    from daam_tpu.models import weights as W
    from daam_tpu.models.configs import get_pipeline_config
    from daam_tpu.ops import attention as attn_mod

    config = get_pipeline_config(model)
    params = W.init_random_params(config, seed=0, dtype=jnp.bfloat16)
    unet = unet_mod.UNet2DConditionModel(config.unet, dtype=jnp.bfloat16)
    s = config.unet.sample_size
    B = 2
    key = jax.random.PRNGKey(0)

    def inputs_for(i):
        k = jax.random.fold_in(key, i)
        latents = jax.random.normal(k, (B, s, s, 4), dtype=jnp.float32)
        t = jnp.full((B,), 500 - i)
        ctx = jax.random.normal(jax.random.fold_in(k, 1),
                                (B, 77, config.unet.cross_attention_dim),
                                dtype=jnp.float32) * 0.1
        return latents, t, ctx

    @jax.jit
    def step(p, x, tt, c):
        return unet.apply({'params': p}, x, tt, c)[0]

    prev = attn_mod.get_odd_packed()
    attn_mod.set_odd_packed(odd_packed)
    try:
        args0 = (params['unet'],) + inputs_for(0)
        _sync(step(*args0))  # trace + compile under the toggle
    finally:
        attn_mod.set_odd_packed(prev)
    arglists = [(params['unet'],) + inputs_for(i) for i in range(1, 9)]
    jax.block_until_ready(arglists)
    return step, arglists


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', default='v2-1-base')
    parser.add_argument('--blocks', type=int, default=6,
                        help='alternating A/B timing blocks per variant')
    parser.add_argument('--device-reps', type=int, default=8,
                        help='profiled calls per variant for device time '
                             '(0 disables)')
    args = parser.parse_args()

    print(f'backend={jax.default_backend()} model={args.model}', flush=True)
    step_on, args_on = build_step(args.model, odd_packed=True)
    print('compiled: ghost-head packed (opt-in)', flush=True)
    step_off, args_off = build_step(args.model, odd_packed=False)
    print('compiled: odd-head fallback (shipping default)', flush=True)

    on_times, off_times = [], []
    for b in range(args.blocks):
        on_times.append(time_block(step_on, args_on))
        off_times.append(time_block(step_off, args_off))
        print(f'block {b}: packed {on_times[-1] * 1e3:7.2f} ms  '
              f'fallback {off_times[-1] * 1e3:7.2f} ms', flush=True)

    t_on = sorted(on_times)[len(on_times) // 2]
    t_off = sorted(off_times)[len(off_times) // 2]
    print(f'wall medians: packed {t_on * 1e3:.2f} ms/step, '
          f'fallback {t_off * 1e3:.2f} ms/step, '
          f'delta {(t_off - t_on) * 1e3:+.2f} ms ({t_off / t_on:.3f}x)')

    if args.device_reps:
        from bench import measure_device_time
        d_on = measure_device_time(
            lambda i: _sync(step_on(*args_on[i % len(args_on)])),
            reps=args.device_reps)
        d_off = measure_device_time(
            lambda i: _sync(step_off(*args_off[i % len(args_off)])),
            reps=args.device_reps)
        if d_on and d_off:
            print(f'device: packed {d_on * 1e3:.2f} ms/step, '
                  f'fallback {d_off * 1e3:.2f} ms/step, '
                  f'delta {(d_off - d_on) * 1e3:+.2f} ms '
                  f'({d_off / d_on:.3f}x)')
        else:
            print(f'device: unavailable (packed={d_on}, fallback={d_off})')


if __name__ == '__main__':
    main()
