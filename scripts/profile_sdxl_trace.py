"""Attribute SDXL tracing overhead: untraced vs traced vs aggregation.

Times warm 2-step 1024² SDXL calls (reps with distinct keys) for:
  A. untraced pipe()
  B. traced pipe() WITHOUT compute_global_heat_map
  C. compute_global_heat_map alone (warm)
Run serially on the chip (uses the persistent compile cache).
"""

import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

import jax
import jax.numpy as jnp
import numpy as np

from daam_tpu import trace, set_seed
from daam_tpu.pipeline.sd import StableDiffusionPipeline


def timed(fn, reps):
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    pipe = StableDiffusionPipeline.from_pretrained('xl-base-1.0',
                                                   dtype=jnp.bfloat16)
    steps = 2

    def untraced(i):
        pipe('a dog', num_inference_steps=steps,
             generator=jax.random.fold_in(set_seed(0), i), output_type='np')

    untraced(99)  # compile
    t_untraced = timed(untraced, 3)
    print(f'untraced       : {t_untraced:.3f} s', flush=True)

    with trace(pipe) as tc:
        def traced_only(i):
            pipe('a dog', num_inference_steps=steps,
                 generator=jax.random.fold_in(set_seed(0), i), output_type='np')

        traced_only(99)  # compile
        t_traced = timed(traced_only, 3)
        print(f'traced (no agg): {t_traced:.3f} s '
              f'(+{(t_traced / t_untraced - 1) * 100:.1f}%)', flush=True)

        tc.compute_global_heat_map()  # compile agg

        def agg(i):
            hm = tc.compute_global_heat_map()
            np.asarray(hm.heat_maps[0, 0, 0])  # host sync

        t_agg = timed(agg, 3)
        print(f'aggregation    : {t_agg:.3f} s', flush=True)

        def full(i):
            traced_only(i)
            agg(i)

        t_full = timed(full, 3)
        print(f'traced + agg   : {t_full:.3f} s '
              f'(+{(t_full / t_untraced - 1) * 100:.1f}%)', flush=True)


if __name__ == '__main__':
    main()
