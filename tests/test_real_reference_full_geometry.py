"""The ACTUAL reference ``daam`` package driven at REAL SD2.1 geometry
(VERDICT r3 #1 — the last offline-closable rung of the fidelity ladder).

``test_against_real_reference.py`` proves the reference package end-to-end at
tiny geometry; ``test_full_geometry.py`` proves the converted 866M SD2.1 UNet
against torch for a single forward.  This module combines them: the
reference's own ``DiffusionHeatMapHooker`` capture
(``daam/trace.py:252-304``) runs a multi-step denoise over the
full-channel-geometry fabricated SD2.1 checkpoint through
``refshim.StableDiffusionPipeline``, and every word's heat map is gated at
Spearman >= 0.99 against our traced pipeline (BASELINE.json:5), with images
within +-2/255.

Two variants:

* default CI: reduced 8x8 latent grid (weight mapping and capture semantics
  are spatial-independent; the channel geometry — 320/640/1280/1280,
  5/10/20/20 heads, 1024-dim context — is the real thing).
* ``DAAM_FULL_GEOMETRY=1``: the real 64x64 latent grid of 512-px SD 2.1
  (``daam/trace.py:32-33`` latent sizes), 3 steps —
  ``scripts/full_geometry_parity.sh`` runs it; results recorded in
  BASELINE.md.
"""

import gc
import os
from dataclasses import replace

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

import refshim  # noqa: E402

if not refshim.reference_available():
    pytest.skip('reference checkout not available', allow_module_level=True)

refdaam = refshim.load_reference_daam()

from daam_tpu import trace  # noqa: E402
from daam_tpu.models import weights as W  # noqa: E402
from daam_tpu.models.configs import get_pipeline_config  # noqa: E402
from daam_tpu.models.weights import _convert_unet  # noqa: E402
from daam_tpu.pipeline.sd import StableDiffusionPipeline  # noqa: E402

from test_e2e_fidelity_torch import _assert_close, _spearman  # noqa: E402
from test_full_geometry import _build_torch_unet  # noqa: E402
from test_weights_conversion import _fabricate_unet_checkpoint  # noqa: E402

FULL_GEOMETRY = os.environ.get('DAAM_FULL_GEOMETRY') == '1' or \
    os.environ.get('DAAM_FULL_SPATIAL') == '1'

PROMPT = 'a dog runs'
GUIDANCE = 7.5
SEED = 0


def _run_parity(spatial: int, steps: int):
    """Drive both stacks over one fabricated real-geometry SD2.1 checkpoint
    and assert capture/aggregation parity."""
    base = get_pipeline_config('v2-1-base')
    cfg = replace(base,
                  unet=replace(base.unet, sample_size=spatial),
                  vae=replace(base.vae, sample_size=spatial * 8))
    params = W.init_random_params(cfg, seed=0)
    pipe = StableDiffusionPipeline(cfg, params)

    sd = _fabricate_unet_checkpoint(cfg.unet)
    pipe.params['unet'] = _convert_unet(sd, cfg.unet)

    with trace(pipe) as tc:
        out = pipe(PROMPT, num_inference_steps=steps,
                   generator=jax.random.PRNGKey(SEED),
                   guidance_scale=GUIDANCE)
        ours_img = np.asarray(out.images[0])
        ours_global = tc.compute_global_heat_map()
        ours_maps = np.asarray(ours_global.heat_maps)
        ours_words = {w: np.asarray(
            ours_global.compute_word_heat_map(w).heatmap)
            for w in PROMPT.split()}

    # the torch model adopts the fabricated arrays in place (no second copy)
    tmodel = _build_torch_unet(cfg.unet, sd)
    shim_pipe = refshim.StableDiffusionPipeline(pipe, tmodel, seed=SEED)

    with refdaam.trace(shim_pipe) as rtc:
        rout = shim_pipe(PROMPT, num_inference_steps=steps,
                         guidance_scale=GUIDANCE,
                         callback=rtc.time_callback)
        ref_img = np.asarray(rout.images[0])
        assert rtc.time_idx == steps
        # factor-8 (8x8) maps are skipped on both sides; at the real 64**2
        # grid the captured set is {1, 2, 4} (within the reference's default
        # factor set); at reduced grids pass the captured set explicitly.
        factors = sorted({f for (f, _, _), _ in iter(rtc.all_heat_maps)})
        ref_global = rtc.compute_global_heat_map(factors=factors)
        ref_maps = ref_global.heat_maps.numpy()
        ref_words = {w: ref_global.compute_word_heat_map(w).heatmap.numpy()
                     for w in PROMPT.split()}

    # the reference located and captured the real layer set: SD2.1 has 16
    # cross-attention layers outside the mid block (up: 3x3, down: 3x2, with
    # the coarsest level uncaptured at factor 8 on the real grid)
    n_layers = len({layer for (_, layer, _), _ in iter(rtc.all_heat_maps)})
    assert n_layers >= 12, n_layers

    assert np.abs(ref_img.astype(int) - ours_img.astype(int)).max() <= 2
    _assert_close(ours_maps, ref_maps)
    for w in PROMPT.split():
        rho = _spearman(ours_words[w], ref_words[w])
        assert rho >= 0.99, f'{w}: Spearman {rho:.4f}'
        np.testing.assert_allclose(ours_words[w], ref_words[w],
                                   rtol=0.05, atol=0.02)

    del tmodel, sd, pipe, params
    gc.collect()
    return n_layers


def test_reference_at_real_channel_geometry_ci():
    """Default-CI variant: real SD2.1 channel geometry (866M UNet), reduced
    8x8 latent grid, 2 steps."""
    _run_parity(spatial=8, steps=2)


@pytest.mark.skipif(not FULL_GEOMETRY,
                    reason='866M x 2 stacks x 3 steps at the real 64**2 '
                           'grid: set DAAM_FULL_GEOMETRY=1 '
                           '(scripts/full_geometry_parity.sh)')
def test_reference_at_real_full_geometry():
    """The real thing: 512-px SD2.1 latent grid (64**2, heat maps on the
    64x64 grid of ``daam/trace.py:32-33``), 3 steps, reference capture vs
    our traced pipeline."""
    _run_parity(spatial=64, steps=3)
