"""Scheduler parity vs diffusion math invariants (and torch/diffusers where cheap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daam_tpu.pipeline.schedulers import (DDIMScheduler, PNDMScheduler,
                                          EulerDiscreteScheduler,
                                          DPMSolverMultistepScheduler,
                                          get_scheduler)


SHAPE = (1, 4, 4, 2)


def _denoise_toy(scheduler, num_steps, x0_true=None, seed=0):
    """Integrate a toy 'model' that always predicts the true noise; a correct
    sampler must recover x0 (for eps-prediction, the exact posterior mean
    path converges to x0 as alpha->1)."""
    rng = np.random.RandomState(seed)
    x0 = np.zeros(SHAPE, np.float32) if x0_true is None else x0_true
    noise = rng.randn(*SHAPE).astype(np.float32)

    state = scheduler.init_state(num_steps, SHAPE, jnp.float32)
    ts = state['timesteps']
    # start at x_T = sqrt(a_T) x0 + sqrt(1-a_T) eps
    a_T = scheduler.alphas_cumprod[int(ts[0])]
    sample = jnp.asarray(np.sqrt(a_T) * x0 + np.sqrt(1 - a_T) * noise)

    n = scheduler.num_scan_steps(num_steps)
    for i in range(n):
        t = int(state['timesteps'][i])
        a_t = scheduler.alphas_cumprod[t]
        model_in = scheduler.scale_model_input(state, sample, i)
        # oracle eps model: derives eps from current sample and known x0
        if isinstance(scheduler, EulerDiscreteScheduler):
            sigma = float(state['sigmas'][i])
            eps = (np.asarray(sample) - x0) / max(sigma, 1e-8)
        else:
            eps = (np.asarray(sample) - np.sqrt(a_t) * x0) / np.sqrt(1 - a_t)
        sample, state = scheduler.step(state, i, jnp.asarray(eps), sample)
    return np.asarray(sample), x0


@pytest.mark.parametrize('cls', [DDIMScheduler, PNDMScheduler,
                                 EulerDiscreteScheduler,
                                 DPMSolverMultistepScheduler])
def test_oracle_denoising_recovers_x0(cls):
    sched = cls()
    x0_true = np.random.RandomState(1).randn(*SHAPE).astype(np.float32) * 0.5
    final, x0 = _denoise_toy(sched, 10, x0_true)
    # with an oracle eps model every sampler should land very near x0
    assert np.abs(final - x0).max() < 0.15, np.abs(final - x0).max()


def test_ddim_matches_closed_form_single_step():
    sched = DDIMScheduler()
    state = sched.init_state(1, SHAPE, jnp.float32)
    sample = jnp.ones(SHAPE)
    eps = jnp.full(SHAPE, 0.1)
    out, _ = sched.step(state, 0, eps, sample)
    a_t = float(state['alpha_t'][0])
    a_prev = float(state['alpha_prev'][0])
    x0 = (1.0 - np.sqrt(1 - a_t) * 0.1) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * 0.1
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_v_prediction_conversion():
    sched = DDIMScheduler(prediction_type='v_prediction')
    a = 0.7
    sample = jnp.ones(SHAPE) * 0.5
    v = jnp.ones(SHAPE) * 0.2
    x0, eps = sched._pred_x0_eps(jnp.asarray(a), v, sample)
    np.testing.assert_allclose(np.asarray(x0),
                               np.sqrt(a) * 0.5 - np.sqrt(1 - a) * 0.2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(eps),
                               np.sqrt(a) * 0.2 + np.sqrt(1 - a) * 0.5, rtol=1e-6)


def test_pndm_scan_steps_and_state_shapes():
    sched = PNDMScheduler()
    n = 10
    assert sched.num_scan_steps(n) == 11
    state = sched.init_state(n, SHAPE, jnp.float32)
    assert state['ets'].shape == (4,) + SHAPE
    assert len(state['timesteps']) == 11
    # second timestep repeated (PLMS bootstrap)
    assert int(state['timesteps'][1]) == int(state['timesteps'][2])


def test_pndm_step_is_scannable():
    sched = PNDMScheduler()
    n = 5
    state = sched.init_state(n, SHAPE, jnp.float32)

    def body(carry, i):
        sample, st = carry
        eps = sample * 0.01
        sample, st = sched.step(st, i, eps, sample)
        return (sample, st), None

    sample = jnp.ones(SHAPE)
    (final, _), _ = jax.lax.scan(body, (sample, state),
                                 jnp.arange(sched.num_scan_steps(n)))
    assert final.shape == SHAPE
    assert np.isfinite(np.asarray(final)).all()


def test_euler_init_noise_sigma():
    sched = EulerDiscreteScheduler()
    assert sched.init_noise_sigma > 10  # SD sigma_max ~14.6
    state = sched.init_state(10, SHAPE, jnp.float32)
    scaled = sched.scale_model_input(state, jnp.ones(SHAPE), 0)
    assert float(np.asarray(scaled).max()) < 1.0


def test_get_scheduler_registry():
    for name in ('ddim', 'pndm', 'euler', 'dpm++'):
        s = get_scheduler(name, 'v_prediction')
        assert s.prediction_type == 'v_prediction'
    with pytest.raises(KeyError):
        get_scheduler('nope')


def test_ddim_against_diffusers_formula_torch():
    """Cross-check the alpha tables against an independent torch recompute."""
    torch = pytest.importorskip('torch')
    sched = DDIMScheduler()
    betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    alphas = torch.cumprod(1 - betas, 0).numpy()
    np.testing.assert_allclose(sched.alphas_cumprod, alphas, rtol=1e-5)
