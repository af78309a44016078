"""Demo-server microbatching: concurrent requests share one traced call."""

import re
import threading

import numpy as np
import pytest

from daam_tpu.pipeline.sd import StableDiffusionPipeline
from daam_tpu.run.demo import make_app


@pytest.fixture(scope='module')
def pipe():
    return StableDiffusionPipeline.from_pretrained('tiny', scheduler='ddim')


def test_concurrent_requests_coalesce(pipe):
    handler = make_app(pipe, default_seed=0, batch_size=2)
    results = {}

    def req(name, prompt):
        results[name] = handler.generate(prompt, '', '', 2, False)

    t1 = threading.Thread(target=req, args=('a', 'a dog runs'))
    t2 = threading.Thread(target=req, args=('b', 'a cat sits'))
    t1.start(); t2.start()
    t1.join(timeout=600); t2.join(timeout=600)
    assert set(results) == {'a', 'b'}

    for name, (prompt, html) in results.items():
        assert html.count('data:image/png;base64') >= 2  # image + word maps

    # both requests were served by the padded batch-2 program: the jit cache
    # holds a B=2 generate signature and no B=1 one
    batch_sizes = {k[0] for k in pipe._jit_cache
                   if isinstance(k, tuple) and isinstance(k[0], int)}
    assert batch_sizes == {2}

    # each request got its own sample (different prompts -> different pages)
    img_re = re.compile(r'data:image/png;base64,([A-Za-z0-9+/=]+)')
    first_a = img_re.search(results['a'][1]).group(1)
    first_b = img_re.search(results['b'][1]).group(1)
    assert first_a != first_b


def test_single_request_through_batcher(pipe):
    """A lone request still completes (padded to the fixed batch)."""
    handler = make_app(pipe, default_seed=0, batch_size=2)
    prompt, html = handler.generate('a bird flies', '', '', 2, False)
    assert 'data:image/png;base64' in html


def test_batcher_reproducible_seed(pipe):
    """Same prompt + seed through the batcher gives the same image."""
    handler = make_app(pipe, default_seed=7, batch_size=2)
    _, html1 = handler.generate('a dog runs', '', '', 2, False)
    _, html2 = handler.generate('a dog runs', '', '', 2, False)
    img_re = re.compile(r'data:image/png;base64,([A-Za-z0-9+/=]+)')
    assert img_re.search(html1).group(1) == img_re.search(html2).group(1)
