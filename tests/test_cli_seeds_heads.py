"""Round-5 CLI fixes: per-layer head sweeps and distinct --random-seed seeds.

The reference hardcodes ``range(16)`` heads in its per-head sweep
(``daam/run/generate.py:239``) — wrong for SDXL's 20-head levels — and draws
``int(time.time())`` per sample (``generate.py:160``), which this rebuild's
batching extension would turn into identical seeds across a chunk.
"""

import numpy as np
import PIL.Image
import pytest

from daam_tpu.run import generate as gen_cli


class _RecordingTrace:
    """Stand-in hooker: records the (layer_idx, head_idx) sweep."""

    def __init__(self, layer_names, layer_heads):
        self.layer_names = layer_names
        self.layer_heads = layer_heads
        self.calls = []

    def compute_global_heat_map(self, layer_idx=None, head_idx=None):
        self.calls.append((layer_idx, head_idx))
        raise RuntimeError('recorded only')


def test_save_all_heads_sweeps_real_per_layer_counts(tmp_path):
    """A 20-head layer gets heads 16-19 swept; a 2-head layer stops at 1."""
    args = gen_cli.build_parser().parse_args(
        ['x', '--all-heads', '-o', str(tmp_path)])
    tc = _RecordingTrace(['up-attn-0', 'down-attn-0'], [20, 2])
    gen_cli.save_all_heads(tc, args, 'id0', 'a dog', 0, 'dog', image=None)
    swept = {(l, h) for l, h in tc.calls}
    assert swept == ({(0, h) for h in range(20)} | {(1, h) for h in range(2)})


def test_layer_heads_matches_located_layout():
    """tc.layer_heads aligns 1:1 with layer_names and carries the per-layer
    head counts from the UNet config (tiny-xl: 4-head cross level)."""
    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.trace import trace

    pipe = StableDiffusionPipeline.from_pretrained('tiny-xl')
    with trace(pipe) as tc:
        assert len(tc.layer_heads) == len(tc.layer_names)
        assert all(h == 4 for h in tc.layer_heads)


def test_all_heads_cli_writes_exactly_per_layer_files(tmp_path):
    """End-to-end --all-heads on the tiny fixture: every located layer dumps
    exactly its real head count (h0..h{H-1}) and nothing beyond."""
    out = tmp_path / 'ah'
    gen_cli.main(['A dog', '--tiny', '-n', '1', '-o', str(out), '-s', '7',
                  '--all-heads'])
    from daam_tpu.pipeline.sd import StableDiffusionPipeline
    from daam_tpu.trace import trace

    pipe = StableDiffusionPipeline.from_pretrained('tiny')
    with trace(pipe) as tc:
        names, heads = tc.layer_names, tc.layer_heads
    for i, (name, n) in enumerate(zip(names, heads)):
        for h in range(n):
            assert (out / f'l{i}-{name}-h{h}-dog.heat_map.png').exists(), \
                (i, name, h)
        assert not (out / f'l{i}-{name}-h{n}-dog.heat_map.png').exists()
    assert not list(out.glob('*-h15-*'))  # the old range(16) tail


def test_random_seed_batched_distinct(tmp_path):
    """batch > 1 with --random-seed: every sample in a chunk gets its own
    seed (and therefore its own initial latents/image)."""
    tsv = tmp_path / 'template.tsv'
    tsv.write_text('word\tpos\ndog\tnoun\ntwo\tnumeral\n')
    out = tmp_path / 'out'
    gen_cli.main(['--action', 'template', '--tiny', '-n', '1',
                  '--template-data-file', str(tsv), '--gen-limit', '2',
                  '--batch-size', '2', '--random-seed', '-o', str(out)])
    dirs = sorted(p for p in out.iterdir() if p.is_dir())
    assert len(dirs) == 2
    prompts = [(d / 'prompt.txt').read_text() for d in dirs]
    assert prompts[0] == prompts[1] == 'two dogs'  # same prompt, so any
    seeds = [(d / 'seed.txt').read_text() for d in dirs]
    assert seeds[0] != seeds[1]
    imgs = [np.array(PIL.Image.open(d / 'output.png')) for d in dirs]
    assert not np.array_equal(imgs[0], imgs[1])
