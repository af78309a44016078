"""Measure daam-demo wall time under concurrent load on the real chip.

Re-measures the round-2 concurrent-load experiment (BASELINE.md: 4 concurrent
50-step requests, microbatched server) after the overlay-rendering rewrite
(VERDICT r4 #6): ``run/demo.py:_overlay_b64`` now composites in numpy and
encodes with PIL instead of driving a matplotlib figure per word overlay,
which BASELINE.md measured as dominating this 1-core host under load.

Protocol (same as the round-2 measurement):
  * real-geometry SD 2.1-base pipeline, bfloat16, DDIM;
  * ``make_app(pipe, batch_size=4)`` behind ``ThreadingHTTPServer``;
  * one warm-up request (compile) then N concurrent 50-step POSTs through
    real HTTP; report the wall time from first send to last response.

Also times the overlay-render component in isolation (per-request host time
spent turning (image, heat maps) into the HTML response) so the host-side win
is attributable.

Usage: python scripts/measure_demo_load.py [--requests 4] [--steps 50]
       [--batch-size 4] [--tiny]
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/daam_tpu_jax_cache'))

PROMPTS = [
    'A dog runs across the field',
    'An angry, bald man doing research',
    'A photo of a cat sitting on a red sofa',
    'Two birds flying over a snowy mountain',
    'A bowl of fruit on a wooden table',
    'A vintage car parked by the beach',
    'A child reading a book under a tree',
    'A lighthouse in a storm at night',
]


def post(port: int, prompt: str, steps: int) -> float:
    data = urllib.parse.urlencode(
        {'prompt': prompt, 'choice': '', 'new_adj': '', 'steps': str(steps)}
    ).encode()
    t0 = time.perf_counter()
    with urllib.request.urlopen(
            f'http://127.0.0.1:{port}/', data=data, timeout=1800) as resp:
        body = resp.read()
    assert b'error' not in body[:4096], body[:500]
    return time.perf_counter() - t0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--requests', type=int, default=4)
    parser.add_argument('--steps', type=int, default=50)
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--port', type=int, default=18321)
    parser.add_argument('--tiny', action='store_true',
                        help='tiny fixture (CPU smoke test of the harness)')
    args = parser.parse_args(argv)

    import http.server

    import jax.numpy as jnp

    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.run.demo import make_app
    from daam_tpu.utils import (enable_persistent_compilation_cache,
                                ensure_hugepages)

    enable_persistent_compilation_cache()
    os.environ.setdefault('DAAM_THP', '1')  # bench-style opt-in (BASELINE.md)
    ensure_hugepages()

    source = 'tiny' if args.tiny else 'v2-1-base'
    pipe = StableDiffusionPipeline.from_pretrained(
        source, scheduler='ddim', dtype=jnp.bfloat16)

    handler = make_app(pipe, default_seed=0, batch_size=args.batch_size)
    server = http.server.ThreadingHTTPServer(('127.0.0.1', args.port), handler)
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    # Warm-up: compiles the traced batch-N pipeline (one signature per step
    # count) and primes the NLP/tokenizer caches.
    t0 = time.perf_counter()
    post(args.port, PROMPTS[0], args.steps)
    warm_s = time.perf_counter() - t0
    print(f'warm-up (compile): {warm_s:.1f} s', file=sys.stderr)

    # Concurrent burst: a barrier releases every sender at once so all N
    # requests land inside the server's coalescing window.
    times = [None] * args.requests
    threads = []
    barrier = threading.Barrier(args.requests + 1)
    for i in range(args.requests):
        def run(i=i):
            barrier.wait()
            times[i] = post(args.port, PROMPTS[i % len(PROMPTS)], args.steps)
        th = threading.Thread(target=run)
        th.start()
        threads.append(th)
    barrier.wait()
    t0 = time.perf_counter()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    # Overlay-render component in isolation: re-run one generation through
    # Handler.generate and time only the HTML/overlay assembly by timing the
    # full call and the underlying submit separately.
    gen = handler.generate
    t0 = time.perf_counter()
    gen(PROMPTS[1], '', '', args.steps, False)
    full_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    handler.batcher.submit(PROMPTS[1], args.steps, 0)
    submit_s = time.perf_counter() - t0
    render_s = max(0.0, full_s - submit_s)

    server.shutdown()
    print(json.dumps({
        'requests': args.requests,
        'steps': args.steps,
        'batch_size': args.batch_size,
        'concurrent_wall_s': round(wall, 2),
        'per_request_s': [round(t, 2) for t in times],
        'overlay_render_s_per_request': round(render_s, 2),
        'warmup_s': round(warm_s, 1),
    }))


if __name__ == '__main__':
    main()
