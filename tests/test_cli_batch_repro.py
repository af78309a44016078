"""Per-sample-seed guarantee: a prompt's output is identical at any --batch-size."""

import numpy as np
import PIL.Image

from daam_tpu.run import generate as gen_cli


def _gen(tmp_path, name, batch_size):
    inp = tmp_path / 'corpus'
    if not inp.exists():
        inp.mkdir()
        for i, (prompt, seed) in enumerate([('a dog runs', 3), ('a cat sits', 9)]):
            d = inp / f'e{i}'
            d.mkdir()
            (d / 'prompt.txt').write_text(prompt)
            (d / 'seed.txt').write_text(str(seed))
    out = tmp_path / name
    gen_cli.main(['--action', 'regenerate', '--tiny', '-n', '2',
                  '-i', str(inp), '-o', str(out),
                  '--batch-size', str(batch_size)])
    return {d.name: np.array(PIL.Image.open(d / 'output.png'))
            for d in out.iterdir() if d.is_dir()}


def test_regenerate_reproduces_across_batch_sizes(tmp_path):
    imgs_b1 = _gen(tmp_path, 'b1', 1)
    imgs_b2 = _gen(tmp_path, 'b2', 2)
    assert set(imgs_b1) == set(imgs_b2) == {'e0', 'e1'}
    for k in imgs_b1:
        np.testing.assert_array_equal(imgs_b1[k], imgs_b2[k])
