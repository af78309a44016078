"""CLI contract tests (reference README: expected artifact set)."""

import json
import numpy as np
import PIL.Image
import pytest

from daam_tpu.run import generate as gen_cli
from daam_tpu.run import evaluate as eval_cli


@pytest.fixture(scope='module')
def quickgen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp('quickgen')
    gen_cli.main(['A dog runs', '--tiny', '-n', '2', '-o', str(out), '-s', '7'])
    return out


def test_quickgen_artifact_contract(quickgen_dir):
    """README contract: output.png, generation.pt, prompt.txt, seed.txt,
    per-word heat maps (reference README.md:31-32)."""
    d = quickgen_dir
    assert (d / 'output.png').exists()
    assert (d / 'generation.pt').exists()
    assert (d / 'prompt.txt').read_text() == 'A dog runs'
    assert (d / 'seed.txt').read_text() == '7'
    for word in ('a', 'dog', 'runs'):
        assert (d / f'{word}.heat_map.png').exists(), word


def test_regenerate_action(quickgen_dir, tmp_path):
    # Rebuild an experiment layout the regenerate action can walk.
    exp_dir = tmp_path / 'exp0'
    exp_dir.mkdir()
    (exp_dir / 'prompt.txt').write_text('a cat sits')
    (exp_dir / 'seed.txt').write_text('3')
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'regenerate', '--tiny', '-n', '2',
                  '-i', str(tmp_path), '-o', str(out)])
    assert (out / 'exp0' / 'prompt.txt').read_text() == 'a cat sits'
    assert (out / 'exp0' / 'seed.txt').read_text() == '3'


def test_template_action(tmp_path):
    tsv = tmp_path / 'template.tsv'
    tsv.write_text('word\tpos\ndog\tnoun\ncat\tnoun\ntwo\tnumeral\n')
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'template', '--tiny', '-n', '1',
                  '--template-data-file', str(tsv), '--gen-limit', '2',
                  '-o', str(out)])
    subdirs = [p for p in out.iterdir() if p.is_dir()]
    assert len(subdirs) == 2
    for d in subdirs:
        prompt = (d / 'prompt.txt').read_text()
        # '{numeral} {noun}' with pluralization after plural numerals
        assert prompt.split()[0] == 'two'
        assert prompt.split()[1] in ('dogs', 'cats')


def test_cconj_action(tmp_path):
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'cconj', '--tiny', '-n', '1', '--gen-limit', '2',
                  '-o', str(out)])
    subdirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    assert len(subdirs) == 2
    for name in subdirs:
        assert name.startswith(('cohypo-', 'diff-'))


def test_pluralize():
    assert gen_cli._pluralize('dog') == 'dogs'
    assert gen_cli._pluralize('box') == 'boxes'
    assert gen_cli._pluralize('city') == 'cities'
    assert gen_cli._pluralize('knife') == 'knives'


def test_evaluate_cli_labeled(tmp_path, capsys):
    """Synthetic experiment folder -> labeled eval report."""
    from daam_tpu.experiment import GenerationExperiment

    img = PIL.Image.new('RGB', (32, 32), (100, 100, 100))
    mask = np.zeros((32, 32), dtype=np.float32)
    mask[8:24, 8:24] = 1

    exp = GenerationExperiment(
        image=img, global_heat_map=np.zeros((77, 16, 16), np.float32),
        prompt='a dog', seed=1, id='e1', path=tmp_path)
    exp.truth_masks = {'dog': mask}
    exp.save(heat_maps=False)
    exp.save_prediction_mask(mask, 'dog', 'daam')

    ev = eval_cli.main(['-i', str(tmp_path)])
    out = capsys.readouterr().out
    assert 'MeanEvaluator<1.0000' in out
    assert len(ev) == 1


def test_evaluate_cli_hungarian(tmp_path, capsys):
    from daam_tpu.experiment import GenerationExperiment

    img = PIL.Image.new('RGB', (32, 32))
    m1 = np.zeros((32, 32), np.float32); m1[:16] = 1
    m2 = np.zeros((32, 32), np.float32); m2[16:] = 1

    exp = GenerationExperiment(
        image=img, global_heat_map=np.zeros((77, 16, 16), np.float32),
        prompt='p', seed=1, id='e1', path=tmp_path)
    exp.truth_masks = {'dog': m1, 'cat': m2}
    exp.save(heat_maps=False)
    exp.save_prediction_mask(m1, 'dog', 'daam')
    exp.save_prediction_mask(m2, 'cat', 'daam')

    eval_cli.main(['-i', str(tmp_path), '-e', 'hungarian'])
    out = capsys.readouterr().out
    assert 'UnsupervisedEvaluator<1.0000' in out


def test_demo_tokenizing_mapping():
    from daam_tpu.run.demo import get_tokenizing_mapping
    from daam_tpu.tokenization import HashWordTokenizer

    tok = HashWordTokenizer()
    merge_idxs, words = get_tokenizing_mapping('a blue dog', tok)
    assert words == ['a', 'blue', 'dog']
    assert merge_idxs == [[1], [2], [3]]


def test_demo_generate_counterfactual(tmp_path):
    """Drive the demo's generate flow directly (headless)."""
    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.run.demo import make_app

    pipe = StableDiffusionPipeline.from_pretrained('tiny')
    handler = make_app(pipe, default_seed=0)
    prompt, html = handler.generate('A blue dog', 'blue', 'red', 2, False)
    assert 'data:image/png;base64' in html
    assert 'transplanted attention' in html
    assert 'DAAM maps' in html


def test_demo_gradio_wiring(monkeypatch):
    """Smoke-test the --gradio code path with a stubbed gradio module.

    Mirrors the reference Gradio app wiring (daam/run/demo.py:163-218)
    without requiring gradio to be installed: the stub records the
    Interface construction and launch args, and the run callback is
    exercised once end-to-end on the tiny fixture pipeline.
    """
    import sys
    import types

    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.run import demo as demo_mod

    calls = {}

    class _Widget:
        def __init__(self, *a, **kw):
            pass

    class _Interface:
        def __init__(self, fn=None, inputs=None, outputs=None, **kw):
            calls['fn'] = fn
            calls['n_inputs'] = len(inputs)

        def launch(self, server_name=None, server_port=None, **kw):
            calls['launch'] = (server_name, server_port)

    stub = types.ModuleType('gradio')
    stub.Interface = _Interface
    stub.Textbox = _Widget
    stub.Slider = _Widget
    stub.Checkbox = _Widget
    stub.HTML = _Widget
    monkeypatch.setitem(sys.modules, 'gradio', stub)

    pipe = StableDiffusionPipeline.from_pretrained('tiny')
    args = demo_mod.get_args(['--tiny', '--port', '8123'])
    demo_mod._gradio_main(pipe, args)

    assert calls['launch'] == ('0.0.0.0', 8123)
    assert calls['n_inputs'] == 5
    html = calls['fn']('A blue dog', '', '', 2, False)
    assert 'data:image/png;base64' in html


def test_time_maps_flag(tmp_path):
    """--time-maps (with --save-heads) writes one heat map per step per word:
    time{S}-{word}.heat_map.png (no reference analog)."""
    out = tmp_path / 'tm'
    gen_cli.main(['A dog runs', '--tiny', '-n', '2', '-o', str(out), '-s', '7',
                  '--save-heads', '--time-maps'])
    for step in (0, 1):
        for word in ('a', 'dog', 'runs'):
            assert (out / f'time{step:03d}-{word}.heat_map.png').exists(), \
                (step, word)
    for word in ('a', 'dog', 'runs'):
        gif = out / f'{word}.time.gif'
        assert gif.exists(), word
        with PIL.Image.open(gif) as im:
            assert getattr(im, 'n_frames', 1) == 2, word


def test_time_maps_flag_without_save_heads(tmp_path):
    """--time-maps WITHOUT --save-heads rides the cheap accumulator-snapshot
    path (VERDICT r3 #5): same artifact set, no replay buffer ever built."""
    out = tmp_path / 'tm2'
    gen_cli.main(['A dog runs', '--tiny', '-n', '2', '-o', str(out), '-s', '7',
                  '--time-maps'])
    for step in (0, 1):
        for word in ('a', 'dog', 'runs'):
            assert (out / f'time{step:03d}-{word}.heat_map.png').exists(), \
                (step, word)
    gif = out / 'dog.time.gif'
    assert gif.exists()
    with PIL.Image.open(gif) as im:
        assert getattr(im, 'n_frames', 1) == 2


def test_time_maps_single_step_writes_gif(tmp_path):
    """-n 1 with --time-maps still writes a (single-frame) GIF (ADVICE r3)."""
    out = tmp_path / 'tm3'
    gen_cli.main(['A dog', '--tiny', '-n', '1', '-o', str(out), '-s', '7',
                  '--time-maps'])
    gif = out / 'dog.time.gif'
    assert gif.exists()
    with PIL.Image.open(gif) as im:
        assert getattr(im, 'n_frames', 1) == 1
