"""Diffusion samplers as pure, scan-compatible step functions.

The reference inherits its schedulers from ``diffusers`` (PNDM default for SD,
DDIM/Euler/DPM-Solver++ selectable).  Re-designed for the jit world: every
scheduler exposes

* ``num_scan_steps(n)`` — how many UNet evaluations ``n`` user steps cost,
* ``init_state(n, sample_shape, dtype)`` — a pytree of precomputed tables
  (indexed by the scan counter) plus fixed-shape mutable state (e.g. PNDM's
  eps ring buffer), and
* ``step(state, i, model_output, sample)`` → ``(prev_sample, state)``,

with all shapes static so the whole sampling loop runs as one ``lax.scan``
(SURVEY.md §7: the reference's per-step Python loop + ``callback`` becomes a
scanned carry).
"""

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['DDIMScheduler', 'PNDMScheduler', 'EulerDiscreteScheduler',
           'DPMSolverMultistepScheduler', 'get_scheduler', 'SCHEDULERS']


def _make_betas(num_train_timesteps: int, beta_start: float, beta_end: float,
                schedule: str) -> np.ndarray:
    if schedule == 'scaled_linear':  # SD default
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if schedule == 'linear':
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    raise ValueError(f'unknown beta schedule {schedule!r}')


@dataclass
class BaseScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = 'scaled_linear'
    prediction_type: str = 'epsilon'
    steps_offset: int = 1

    def __post_init__(self):
        betas = _make_betas(self.num_train_timesteps, self.beta_start,
                            self.beta_end, self.beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas, axis=0)

    def _timesteps_desc(self, num_steps: int) -> np.ndarray:
        """Descending training-timestep indices for ``num_steps`` user steps."""
        step_ratio = self.num_train_timesteps // num_steps
        ts = (np.arange(0, num_steps) * step_ratio).round().astype(np.int64)
        ts = ts + self.steps_offset
        return np.clip(ts, 0, self.num_train_timesteps - 1)[::-1].copy()

    def _pred_x0_eps(self, t_alpha, model_output, sample):
        """(pred_x0, pred_eps) under the configured prediction type."""
        a_sqrt = jnp.sqrt(t_alpha)
        s_sqrt = jnp.sqrt(1.0 - t_alpha)
        if self.prediction_type == 'v_prediction':
            x0 = a_sqrt * sample - s_sqrt * model_output
            eps = a_sqrt * model_output + s_sqrt * sample
        else:  # epsilon
            x0 = (sample - s_sqrt * model_output) / a_sqrt
            eps = model_output
        return x0, eps

    def num_scan_steps(self, num_steps: int) -> int:
        return num_steps

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, state: Dict[str, Any], sample, i):
        return sample


@dataclass
class DDIMScheduler(BaseScheduler):
    """Deterministic DDIM (eta = 0)."""

    set_alpha_to_one: bool = False

    def init_state(self, num_steps: int, sample_shape=None,
                   dtype=jnp.float32) -> Dict[str, Any]:
        ts = self._timesteps_desc(num_steps)
        step_ratio = self.num_train_timesteps // num_steps
        prev_ts = ts - step_ratio
        alpha_t = self.alphas_cumprod[ts]
        final_alpha = 1.0 if self.set_alpha_to_one else float(self.alphas_cumprod[0])
        alpha_prev = np.where(prev_ts >= 0,
                              self.alphas_cumprod[np.clip(prev_ts, 0, None)],
                              final_alpha)
        return {
            'timesteps': jnp.asarray(ts),
            'alpha_t': jnp.asarray(alpha_t, dtype=jnp.float32),
            'alpha_prev': jnp.asarray(alpha_prev, dtype=jnp.float32),
        }

    def step(self, state, i, model_output, sample):
        a_t = state['alpha_t'][i]
        a_prev = state['alpha_prev'][i]
        x0, eps = self._pred_x0_eps(a_t, model_output, sample)
        prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return prev, state


@dataclass
class PNDMScheduler(BaseScheduler):
    """PNDM / PLMS with skipped Runge-Kutta warmup — the SD 1.x/2.x default.

    Faithful to the reference's scheduler semantics: the second timestep is
    evaluated twice (the half-started linear multistep bootstrap), the second
    eps is *not* pushed to the history, and the integration at that step
    restarts from the saved ``cur_sample``.  All of this is table-driven so it
    scans: tables are indexed by the scan counter, the eps history is a
    fixed-shape ring buffer.
    """

    def num_scan_steps(self, num_steps: int) -> int:
        return num_steps + 1 if num_steps > 1 else num_steps

    def init_state(self, num_steps: int, sample_shape=None,
                   dtype=jnp.float32) -> Dict[str, Any]:
        assert sample_shape is not None, 'PNDM needs sample_shape for its eps history'
        ts = self._timesteps_desc(num_steps)
        ratio = self.num_train_timesteps // num_steps
        final_alpha = float(self.alphas_cumprod[0])

        if num_steps > 1:
            unet_ts = np.concatenate([ts[:1], ts[1:2], ts[1:]])
            n = len(unet_ts)
            ts_from = unet_ts.copy()
            ts_from[1] = ts[0]           # step 1 integrates t0 -> t1 again
            prev_ts = ts_from - ratio
            prev_ts[1] = ts[1]
            use_cur = np.zeros(n, dtype=np.int32)
            use_cur[1] = 1
            push = np.ones(n, dtype=np.int32)
            push[1] = 0
            # multistep order selector: 0=1st(e1), 1=avg, 2=2nd, 3=3rd, 4=4th.
            # order[i] = min(i, 4), built with clip so short schedules
            # (n = num_steps+1 as low as 3) don't index past the table
            # (ADVICE r1: num_steps=2 IndexError).
            order = np.clip(np.arange(n), 0, 4)
        else:
            unet_ts = ts
            ts_from = ts
            prev_ts = ts - ratio
            use_cur = np.zeros(1, dtype=np.int32)
            push = np.ones(1, dtype=np.int32)
            order = np.zeros(1, dtype=np.int32)

        alpha_t = self.alphas_cumprod[np.clip(ts_from, 0, None)]
        alpha_prev = np.where(prev_ts >= 0,
                              self.alphas_cumprod[np.clip(prev_ts, 0, None)],
                              final_alpha)
        return {
            'timesteps': jnp.asarray(unet_ts),
            'alpha_t': jnp.asarray(alpha_t, dtype=jnp.float32),
            'alpha_prev': jnp.asarray(alpha_prev, dtype=jnp.float32),
            'use_cur': jnp.asarray(use_cur),
            'push': jnp.asarray(push),
            'order': jnp.asarray(order),
            'ets': jnp.zeros((4,) + tuple(sample_shape), dtype=dtype),
            'cur_sample': jnp.zeros(tuple(sample_shape), dtype=dtype),
        }

    def step(self, state, i, model_output, sample):
        a_t = state['alpha_t'][i]
        a_prev = state['alpha_prev'][i]

        # The linear-multistep history holds RAW model outputs (v-space for
        # v-prediction models); the combined output converts to eps once,
        # using the current integration sample and alpha — matching diffusers'
        # PNDMScheduler._get_prev_sample (ADVICE r1: converting per-step
        # silently diverges for v-pred models).
        out = model_output

        push = state['push'][i]
        ets = jnp.where(push > 0,
                        jnp.roll(state['ets'], shift=1, axis=0).at[0].set(out),
                        state['ets'])
        cur_sample = jnp.where(state['use_cur'][i] > 0,
                               state['cur_sample'], sample)
        new_cur = jnp.where(i == 0, sample, state['cur_sample'])

        e1, e2, e3, e4 = ets[0], ets[1], ets[2], ets[3]
        out_prime = jax.lax.switch(
            state['order'][i],
            [lambda: out,                                    # first step
             lambda: (out + e1) / 2,                         # bootstrap average
             lambda: (3 * e1 - e2) / 2,
             lambda: (23 * e1 - 16 * e2 + 5 * e3) / 12,
             lambda: (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24])

        if self.prediction_type == 'v_prediction':
            eps_prime = (jnp.sqrt(a_t) * out_prime +
                         jnp.sqrt(1.0 - a_t) * cur_sample)
        else:
            eps_prime = out_prime

        prev = self._prev_sample(cur_sample, a_t, a_prev, eps_prime)
        state = dict(state)
        state['ets'] = ets
        state['cur_sample'] = new_cur
        return prev, state

    @staticmethod
    def _prev_sample(sample, a_t, a_prev, eps):
        # PNDM transfer formula (eq. 11 of the PNDM paper).
        sigma_prev = jnp.sqrt(1 - a_prev)
        denom = a_t * sigma_prev + jnp.sqrt(a_t * a_prev * (1 - a_t))
        return jnp.sqrt(a_prev / a_t) * sample - (a_prev - a_t) * eps / denom


@dataclass
class EulerDiscreteScheduler(BaseScheduler):
    """Euler discrete (sigma parameterization, deterministic)."""

    def init_state(self, num_steps: int, sample_shape=None,
                   dtype=jnp.float32) -> Dict[str, Any]:
        ts = self._timesteps_desc(num_steps).astype(np.float64)
        sigmas_full = np.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)
        sigmas = np.interp(ts, np.arange(self.num_train_timesteps), sigmas_full)
        sigmas = np.concatenate([sigmas, [0.0]])
        return {
            'timesteps': jnp.asarray(ts.round().astype(np.int64)),
            'sigmas': jnp.asarray(sigmas, dtype=jnp.float32),
        }

    @property
    def init_noise_sigma(self) -> float:
        sigmas = np.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)
        return float(np.sqrt(sigmas.max() ** 2 + 1))

    def scale_model_input(self, state, sample, i):
        sigma = state['sigmas'][i]
        return sample / jnp.sqrt(sigma ** 2 + 1)

    def step(self, state, i, model_output, sample):
        sigma = state['sigmas'][i]
        if self.prediction_type == 'v_prediction':
            x0 = sample / (sigma ** 2 + 1) - model_output * sigma / jnp.sqrt(sigma ** 2 + 1)
        else:
            x0 = sample - sigma * model_output
        derivative = (sample - x0) / sigma
        dt = state['sigmas'][i + 1] - sigma
        return sample + derivative * dt, state


@dataclass
class DPMSolverMultistepScheduler(BaseScheduler):
    """DPM-Solver++ (2M), deterministic — the fast high-order sampler
    commonly paired with SDXL."""

    def init_state(self, num_steps: int, sample_shape=None,
                   dtype=jnp.float32) -> Dict[str, Any]:
        assert sample_shape is not None, 'DPM-Solver needs sample_shape'
        ts = self._timesteps_desc(num_steps)
        alpha_bar = self.alphas_cumprod[ts]
        a = np.sqrt(alpha_bar)
        s = np.sqrt(1 - alpha_bar)
        lam = np.log(a) - np.log(s)

        # Per-step update coefficients prev = c_sample*x + c_d*D, precomputed
        # with the denoise-to-zero terminal boundary folded in as its exact
        # limit: sigma_{N} -> 0 gives c_sample = 0, c_d = 1 (prev = x0), the
        # same terminal diffusers uses (ADVICE r1: the previous 0.9999 ad-hoc
        # boundary deviates at typical step counts).
        c_sample = np.empty(len(ts))
        c_d = np.empty(len(ts))
        for i in range(len(ts) - 1):
            h = lam[i + 1] - lam[i]
            c_sample[i] = s[i + 1] / s[i]
            c_d[i] = -a[i + 1] * np.expm1(-h)
        c_sample[-1] = 0.0
        c_d[-1] = 1.0

        # lower_order_final: force first-order on the final step for short
        # schedules (diffusers: len(timesteps) < 15), where a second-order
        # extrapolation into the terminal limit visibly deviates.
        first_order = np.zeros(len(ts), dtype=np.int32)
        if len(ts) < 15:
            first_order[-1] = 1

        # finite stand-in for the terminal lambda (only enters the 2nd-order
        # ratio r, which the first-order terminal step never uses)
        lam_ext = np.concatenate([lam, [lam[-1] + 40.0]])
        return {
            'timesteps': jnp.asarray(ts),
            'alpha_sqrt': jnp.asarray(a, dtype=jnp.float32),
            'lambda': jnp.asarray(lam_ext, dtype=jnp.float32),
            'c_sample': jnp.asarray(c_sample, dtype=jnp.float32),
            'c_d': jnp.asarray(c_d, dtype=jnp.float32),
            'first_order': jnp.asarray(first_order),
            'prev_x0': jnp.zeros(tuple(sample_shape), dtype=dtype),
            'has_prev': jnp.asarray(0, dtype=jnp.int32),
        }

    def step(self, state, i, model_output, sample):
        a_bar = state['alpha_sqrt'][i] ** 2
        x0, _ = self._pred_x0_eps(a_bar, model_output, sample)

        lam = state['lambda']
        h = lam[i + 1] - lam[i]
        h_last = lam[i] - lam[jnp.maximum(i - 1, 0)]
        r = h_last / h

        use_2nd = (state['has_prev'] > 0) & (state['first_order'][i] == 0)
        d = jnp.where(use_2nd,
                      x0 + (x0 - state['prev_x0']) / (2.0 * jnp.where(r == 0, 1.0, r)),
                      x0)
        prev = state['c_sample'][i] * sample + state['c_d'][i] * d

        state = dict(state)
        state['prev_x0'] = x0
        state['has_prev'] = state['has_prev'] + 1
        return prev, state


SCHEDULERS = {
    'ddim': DDIMScheduler,
    'pndm': PNDMScheduler,
    'euler': EulerDiscreteScheduler,
    'dpm++': DPMSolverMultistepScheduler,
    'dpmsolver': DPMSolverMultistepScheduler,
}


def get_scheduler(name: str, prediction_type: str = 'epsilon') -> BaseScheduler:
    if name not in SCHEDULERS:
        raise KeyError(f'unknown scheduler {name!r}; available: {sorted(SCHEDULERS)}')
    return SCHEDULERS[name](prediction_type=prediction_type)
