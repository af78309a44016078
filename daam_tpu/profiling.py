"""Performance profiling utilities (SURVEY.md §5: the reference has none —
its "trace" is semantic; the rebuild adds real profiler integration since the
north-star metric is throughput).

``profile_trace(logdir)`` wraps ``jax.profiler`` for capturing device traces
viewable in TensorBoard/XProf; ``time_pipeline`` gives quick wall-clock
numbers per stage without external tooling.
"""

import contextlib
import time
from typing import Callable, Dict, List, Optional

__all__ = ['profile_trace', 'time_pipeline', 'StepTimer']


@contextlib.contextmanager
def profile_trace(logdir: str = '/tmp/daam_tpu_profile',
                  host_tracer_level: int = 2):
    """Capture a device + host profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer for named stages; blocks on device results."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        import jax

        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def record(self, name: str, fn: Callable, *args, **kwargs):
        import jax

        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, float]:
        return {name: sorted(ts)[len(ts) // 2] for name, ts in self.times.items()}

    def __str__(self):
        return '  '.join(f'{k}={v * 1e3:.1f}ms' for k, v in self.summary().items())


def time_pipeline(pipe, prompt: str = 'a dog', num_inference_steps: int = 10,
                  reps: int = 3, traced: bool = False) -> Dict[str, float]:
    """Median per-call wall-clock for a pipeline, optionally under trace."""
    from .trace import trace as trace_ctx
    from .utils import set_seed

    timer = StepTimer()
    key = set_seed(0)

    def run():
        return pipe(prompt, num_inference_steps=num_inference_steps,
                    generator=key, output_type='np')

    if traced:
        with trace_ctx(pipe):
            run()  # compile
            for _ in range(reps):
                with timer.stage('traced_call'):
                    run()
    else:
        run()
        for _ in range(reps):
            with timer.stage('call'):
                run()
    return timer.summary()
