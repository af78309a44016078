"""Benchmark harness: traced vs untraced Stable Diffusion throughput on TPU.

Measures the north-star metric (BASELINE.json): **SDXL 50-step** traced
imgs/sec/chip, with ``vs_baseline`` = traced/untraced throughput ratio (the
tracing-overhead target is ≥ 0.95).  The reference publishes no numbers
(BASELINE.md), so the untraced run on the same hardware IS the baseline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Flags: --model (default xl-base-1.0, the BASELINE.json north-star config),
--steps, --batch, --reps, --image-size.
"""

import argparse
import json
import os
import sys
import time

# Persistent compilation cache: the first bench invocation pays the (remote)
# compile; later invocations and driver re-runs start hot.  The env var alone
# is NOT enough when a site hook imports jax before this script runs (the var
# is read at jax import time), so utils.enable_persistent_compilation_cache
# also sets the live config value.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))


def run_config(pipe, prompt, steps, batch, traced, reps, height, width, key):
    """Median wall-clock seconds per pipeline call.

    Each rep uses a distinct PRNG key so every call is a genuinely new
    computation (identical repeated programs can be memoized/pipelined by
    remote execution layers, inflating throughput)."""
    import jax

    from daam_tpu import trace

    prompts = [prompt] * batch if batch > 1 else prompt

    def one_call(i):
        # Default output ('pil'): the path a reference user gets from the CLI
        # and library.  Quantizes to uint8 on device, so the device->host
        # fetch moves 4x fewer bytes than an fp32 'np' fetch.
        return pipe(prompts, num_inference_steps=steps,
                    generator=jax.random.fold_in(key, i),
                    height=height, width=width)

    times = []
    if traced:
        with trace(pipe) as tc:
            one_call(0)  # compile
            tc.compute_global_heat_map()
            for i in range(reps):
                t0 = time.perf_counter()
                one_call(i + 1)
                # Force materialization of maps too (they are part of the
                # traced deliverable).
                tc.compute_global_heat_map()
                times.append(time.perf_counter() - t0)
    else:
        one_call(0)  # compile
        for i in range(reps):
            t0 = time.perf_counter()
            one_call(i + 1)
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', default='xl-base-1.0')
    parser.add_argument('--steps', type=int, default=50)
    parser.add_argument('--batch', type=int, default=1)
    # Median over several reps: per-call wall time through the remote-TPU
    # relay varies ±5-10% run to run; more reps stabilize the ratio.
    parser.add_argument('--reps', type=int, default=7)
    parser.add_argument('--image-size', type=int, default=None)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--scheduler', default='ddim')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.utils import (enable_persistent_compilation_cache,
                                ensure_hugepages, set_seed)
    enable_persistent_compilation_cache()
    ensure_hugepages()

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(
        args.model, scheduler=args.scheduler, dtype=dtype)
    size = args.image_size or pipe.config.image_size
    key = set_seed(0)
    prompt = 'A dog runs across the field'

    n_chips = jax.device_count()
    t_untraced = run_config(pipe, prompt, args.steps, args.batch, False,
                            args.reps, size, size, key)
    t_traced = run_config(pipe, prompt, args.steps, args.batch, True,
                          args.reps, size, size, key)

    imgs_per_sec_traced = args.batch / t_traced / n_chips
    ratio = t_untraced / t_traced  # >= 0.95 target

    print(json.dumps({
        'metric': f'{args.model}_traced_imgs_per_sec_per_chip_{args.steps}steps',
        'value': round(imgs_per_sec_traced, 5),
        'unit': 'imgs/sec/chip',
        'vs_baseline': round(ratio, 4),
    }))
    # Supplementary details on stderr (driver reads only the stdout line).
    print(f'untraced: {t_untraced:.3f}s/call  traced: {t_traced:.3f}s/call  '
          f'overhead: {(t_traced / t_untraced - 1) * 100:.2f}%  '
          f'chips: {n_chips}  size: {size}  steps: {args.steps}',
          file=sys.stderr)


if __name__ == '__main__':
    main()
