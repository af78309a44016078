"""Heat-map fidelity harness: daam-tpu vs the PyTorch reference (DAAM).

The BASELINE target is ≥0.99 Spearman correlation between our heat maps and
PyTorch DAAM's for the same prompt/seed/checkpoint (BASELINE.md).  This script
runs both stacks side by side and reports per-word Spearman + max-abs-err.

Requirements (NOT available in the air-gapped build environment — run where
you have them): ``torch`` with CUDA or CPU, ``diffusers``, the reference
``daam`` package, and a local SD checkpoint directory usable by both.

Usage:
    python scripts/fidelity_vs_reference.py /path/to/stable-diffusion-2-1-base \
        --prompt "A dog runs across the field" --steps 30 --seed 0
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('checkpoint')
    parser.add_argument('--prompt', default='A dog runs across the field')
    parser.add_argument('--steps', type=int, default=30)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--words', nargs='*', default=None,
                        help='words to compare (default: all prompt words)')
    args = parser.parse_args()

    try:
        import torch  # noqa: F401
        import diffusers  # noqa: F401
        import daam as daam_ref
    except ImportError as e:
        print(f'missing dependency for the reference stack: {e}', file=sys.stderr)
        print('run this script in an environment with torch+diffusers+daam',
              file=sys.stderr)
        return 2

    import numpy as np
    from scipy.stats import spearmanr

    # ---- reference run -----------------------------------------------------
    import torch
    from diffusers import StableDiffusionPipeline as TorchSD

    pipe_ref = TorchSD.from_pretrained(args.checkpoint)
    gen = daam_ref.set_seed(args.seed)
    with torch.no_grad(), daam_ref.trace(pipe_ref) as tc_ref:
        pipe_ref(args.prompt, num_inference_steps=args.steps, generator=gen)
        gm_ref = tc_ref.compute_global_heat_map()

    # ---- daam-tpu run ------------------------------------------------------
    import jax.numpy as jnp
    from daam_tpu import trace as trace_tpu, set_seed as set_seed_tpu
    from daam_tpu.pipeline.sd import StableDiffusionPipeline

    pipe = StableDiffusionPipeline.from_pretrained(args.checkpoint,
                                                   dtype=jnp.bfloat16)
    with trace_tpu(pipe) as tc:
        pipe(args.prompt, num_inference_steps=args.steps,
             generator=set_seed_tpu(args.seed))
        gm = tc.compute_global_heat_map()

    # ---- compare -----------------------------------------------------------
    words = args.words or [w for w in args.prompt.split() if w.isalpha()]
    print(f'{"word":>15}  {"spearman":>9}  {"max_abs_err":>12}')
    worst = 1.0
    for word in words:
        try:
            ref = gm_ref.compute_word_heat_map(word).value.cpu().numpy()
            ours = np.asarray(gm.compute_word_heat_map(word).value)
        except ValueError:
            continue
        if ref.shape != ours.shape:
            from daam_tpu.ops.resize import bicubic_resize
            ours = np.asarray(bicubic_resize(
                jnp.asarray(ours)[None, None], ref.shape)[0, 0])
        rho = spearmanr(ref.ravel(), ours.ravel()).statistic
        worst = min(worst, rho)
        print(f'{word:>15}  {rho:9.4f}  {np.abs(ref - ours).max():12.5f}')

    print(f'\nworst-word Spearman: {worst:.4f}  (target >= 0.99)')
    return 0 if worst >= 0.99 else 1


if __name__ == '__main__':
    sys.exit(main())
