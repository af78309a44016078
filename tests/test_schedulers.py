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


def test_pndm_two_steps_no_crash():
    """ADVICE r1: PNDM init_state crashed with IndexError at num_steps=2."""
    import jax.numpy as jnp
    from daam_tpu.pipeline.schedulers import PNDMScheduler

    s = PNDMScheduler()
    state = s.init_state(2, (1, 4, 4, 4), jnp.float32)
    assert state['order'].shape[0] == s.num_scan_steps(2) == 3
    x = jnp.ones((1, 4, 4, 4))
    for i in range(s.num_scan_steps(2)):
        x, state = s.step(state, i, jnp.zeros_like(x) + 0.1, x)
    assert jnp.isfinite(x).all()


def test_pndm_v_prediction_combines_raw_outputs():
    """ADVICE r1: v-pred PNDM must combine raw v-space outputs and convert
    once at integration time (diffusers semantics), not convert per step."""
    import numpy as np
    import jax.numpy as jnp
    from daam_tpu.pipeline.schedulers import PNDMScheduler

    s = PNDMScheduler(prediction_type='v_prediction')
    n_user = 4
    state = s.init_state(n_user, (1, 2, 2, 1), jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 2, 1).astype(np.float32))
    outs = [jnp.asarray(rng.randn(1, 2, 2, 1).astype(np.float32))
            for _ in range(s.num_scan_steps(n_user))]

    # reference computation: raw outputs in the ets buffer, combined output
    # converted to eps with the *current* sample and alpha
    ets = []
    cur_sample = None
    xs = x
    for i, out in enumerate(outs):
        a_t = float(state['alpha_t'][i])
        a_prev = float(state['alpha_prev'][i])
        push = int(state['push'][i])
        use_cur = int(state['use_cur'][i])
        if push:
            ets.insert(0, out)
        sample_i = cur_sample if use_cur else xs
        if i == 0:
            cur_sample = xs
        order = int(state['order'][i])
        if order == 0:
            comb = out
        elif order == 1:
            comb = (out + ets[0]) / 2
        elif order == 2:
            comb = (3 * ets[0] - ets[1]) / 2
        elif order == 3:
            comb = (23 * ets[0] - 16 * ets[1] + 5 * ets[2]) / 12
        else:
            comb = (55 * ets[0] - 59 * ets[1] + 37 * ets[2] - 9 * ets[3]) / 24
        eps = np.sqrt(a_t) * comb + np.sqrt(1 - a_t) * sample_i
        sigma_prev = np.sqrt(1 - a_prev)
        denom = a_t * sigma_prev + np.sqrt(a_t * a_prev * (1 - a_t))
        xs = np.sqrt(a_prev / a_t) * sample_i - (a_prev - a_t) * eps / denom

    xj = x
    sj = state
    for i, out in enumerate(outs):
        xj, sj = s.step(sj, i, out, xj)
    np.testing.assert_allclose(np.asarray(xj), np.asarray(xs), rtol=1e-4,
                               atol=1e-5)


def test_dpm_solver_final_step_first_order_denoises_to_x0():
    """ADVICE r1: DPM++ short schedules force first-order on the final step
    with the sigma->0 terminal (prev = x0 exactly)."""
    import numpy as np
    import jax.numpy as jnp
    from daam_tpu.pipeline.schedulers import DPMSolverMultistepScheduler

    s = DPMSolverMultistepScheduler()
    state = s.init_state(3, (1, 2, 2, 1), jnp.float32)
    assert int(state['first_order'][-1]) == 1
    assert float(state['c_sample'][-1]) == 0.0
    assert float(state['c_d'][-1]) == 1.0

    x = jnp.ones((1, 2, 2, 1)) * 0.5
    st = state
    for i in range(3):
        x, st = s.step(st, i, jnp.zeros_like(x) + 0.3, x)
    # final step: prev == pred_x0 of the last (sample, output) pair exactly
    a_bar = float(state['alpha_sqrt'][2]) ** 2
    assert jnp.isfinite(x).all()
    # recompute reference final x0 by replaying two steps
    x_ref = jnp.ones((1, 2, 2, 1)) * 0.5
    st2 = s.init_state(3, (1, 2, 2, 1), jnp.float32)
    for i in range(2):
        x_ref, st2 = s.step(st2, i, jnp.zeros_like(x_ref) + 0.3, x_ref)
    x0_final = (x_ref - np.sqrt(1 - a_bar) * 0.3) / np.sqrt(a_bar)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0_final), rtol=1e-5)
