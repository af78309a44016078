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

def test_overlay_b64_matches_jet_composite_without_figures(monkeypatch):
    """The request-path overlay is the pure numpy/PIL composite: identical
    pixels to heatmap._jet_composite, and no matplotlib figure machinery
    (VERDICT r4 #6 — figures dominated the 1-core host under load)."""
    import base64
    import io
    import sys

    import PIL.Image

    from daam_tpu.heatmap import WordHeatMap, _jet_composite
    from daam_tpu.run.demo import _overlay_b64

    rng = np.random.RandomState(0)
    image = PIL.Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    wm = WordHeatMap(rng.rand(8, 8).astype(np.float32), word='dog')

    # fail the test if the overlay path touches pyplot
    monkeypatch.setitem(sys.modules, 'matplotlib.pyplot', None)

    b64 = _overlay_b64(image, wm)
    got = np.asarray(PIL.Image.open(io.BytesIO(base64.b64decode(b64))))
    expect = (_jet_composite(np.asarray(image), wm.expand_as(image),
                             color_normalize=True) * 255).astype(np.uint8)
    assert got.shape == (64, 64, 3)
    np.testing.assert_array_equal(got, expect)


def test_gradio_branch_wiring(monkeypatch, pipe):
    """--gradio builds an Interface around Handler.generate and launches it
    (reference demo.py:163-218). gradio isn't installed here, so exercise
    the wiring against a minimal stub module."""
    import sys
    import types

    from daam_tpu.run import demo as demo_mod

    calls = {}

    class _Comp:
        def __init__(self, *a, **kw):
            pass

    class _Interface:
        def __init__(self, fn=None, inputs=None, outputs=None, title=None):
            calls['fn'] = fn
            calls['n_inputs'] = len(inputs)
            calls['title'] = title

        def launch(self, server_name=None, server_port=None):
            calls['launched'] = (server_name, server_port)

    stub = types.ModuleType('gradio')
    stub.Interface = _Interface
    stub.Textbox = _Comp
    stub.Slider = _Comp
    stub.Checkbox = _Comp
    stub.HTML = _Comp
    monkeypatch.setitem(sys.modules, 'gradio', stub)

    args = types.SimpleNamespace(seed=0, batch_size=1, port=7860)
    demo_mod._gradio_main(pipe, args)

    assert calls['launched'] == ('0.0.0.0', 7860)
    assert calls['n_inputs'] == 5
    # the wrapped fn runs a real traced generation and returns the html pane
    html = calls['fn']('a dog runs', '', '', 1, False)
    assert 'data:image/png;base64' in html
