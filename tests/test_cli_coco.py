"""COCO-based CLI actions on a synthetic captions file."""

import json

import pytest

from daam_tpu.run import generate as gen_cli


@pytest.fixture
def coco_input(tmp_path):
    captions = {'annotations': [
        {'id': 101, 'caption': 'A brown dog chases a white cat'},
        {'id': 102, 'caption': 'A red car near a tall tree'},
        {'id': 103, 'caption': 'The small bird sits on a bench'},
    ]}
    inp = tmp_path / 'input'
    inp.mkdir()
    (inp / 'captions_val2014.json').write_text(json.dumps(captions))
    return inp


def test_coco_action(coco_input, tmp_path):
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'coco', '--tiny', '-n', '1', '--gen-limit', '2',
                  '-i', str(coco_input), '-o', str(out)])
    subdirs = [p for p in out.iterdir() if p.is_dir()]
    assert len(subdirs) == 2
    for d in subdirs:
        assert (d / 'output.png').exists()
        assert int(d.name) in (101, 102, 103)


def test_coco_unreal_action(coco_input, tmp_path):
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'coco-unreal', '--tiny', '-n', '1',
                  '--gen-limit', '1', '-i', str(coco_input), '-o', str(out)])
    subdirs = [p for p in out.iterdir() if p.is_dir()]
    assert len(subdirs) == 1
    prompt = (subdirs[0] / 'prompt.txt').read_text()
    assert prompt  # ADJ/NOUN-shuffled caption generated


def test_word_lemma_filter(coco_input, tmp_path):
    out = tmp_path / 'out'
    # '--word dog': only captions containing 'dog' exactly once survive
    gen_cli.main(['--action', 'coco', '--tiny', '-n', '1', '--word', 'dog',
                  '-i', str(coco_input), '-o', str(out)])
    subdirs = [p for p in out.iterdir() if p.is_dir()]
    assert [d.name for d in subdirs] == ['101']
    assert (subdirs[0] / 'dog.heat_map.png').exists()


def test_batch_size_flag(coco_input, tmp_path):
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'coco', '--tiny', '-n', '1', '--gen-limit', '2',
                  '--batch-size', '2', '-i', str(coco_input), '-o', str(out)])
    subdirs = [p for p in out.iterdir() if p.is_dir()]
    assert len(subdirs) == 2
    prompts = {(d / 'prompt.txt').read_text() for d in subdirs}
    assert len(prompts) == 2  # both samples traced in one batched call
