import numpy as np
import pytest

from daam_tpu.heatmap import (GlobalHeatMap, RawHeatMapCollection, WordHeatMap,
                              plot_overlay_heat_map)
from daam_tpu.tokenization import HashWordTokenizer


@pytest.fixture
def tok():
    return HashWordTokenizer()


def test_collection_update_sums():
    col = RawHeatMapCollection()
    m = np.ones((77, 8, 8), dtype=np.float32)
    col.update(2, 0, 1, m)
    col.update(2, 0, 1, m)
    [(key, val)] = list(col)
    assert key == (2, 0, 1)
    np.testing.assert_array_equal(np.asarray(val), 2 * m)


def test_collection_block_path():
    col = RawHeatMapCollection()
    block = np.arange(2 * 3 * 4 * 2 * 2, dtype=np.float32).reshape(2, 3, 4, 2, 2)
    col.update_block(1, block, layer_ids=[5, 7])
    items = dict(iter(col))
    assert set(items.keys()) == {(1, l, h) for l in (5, 7) for h in range(3)}
    np.testing.assert_array_equal(np.asarray(items[(1, 7, 2)]), block[1, 2])
    # summing a second block
    col.update_block(1, block, layer_ids=[5, 7])
    items = dict(iter(col))
    np.testing.assert_array_equal(np.asarray(items[(1, 5, 0)]), 2 * block[0, 0])


def test_collection_sets_and_clear():
    col = RawHeatMapCollection()
    col.update(4, 1, 0, np.zeros((77, 4, 4), np.float32))
    col.update_block(2, np.zeros((1, 2, 77, 8, 8), np.float32), layer_ids=[3])
    assert col.factors() == {4, 2}
    assert col.layers() == {1, 3}
    assert col.heads() == {0, 1}
    assert len(col) == 3
    col.clear()
    assert len(col) == 0


def test_global_heat_map_word_query(tok):
    prompt = 'a dog runs'
    maps = np.zeros((77, 16, 16), dtype=np.float32)
    maps[2] = 1.0  # 'dog' is token 1, +1 SOS = index 2
    ghm = GlobalHeatMap(tok, prompt, maps)
    whm = ghm.compute_word_heat_map('dog')
    assert isinstance(whm, WordHeatMap)
    np.testing.assert_array_equal(np.asarray(whm.value), np.ones((16, 16)))
    # lru cache returns same object
    assert ghm.compute_word_heat_map('dog') is whm


def test_global_heat_map_subword_mean(tok):
    prompt = 'an extraordinarily dog'
    n_pieces = len(tok.tokenize('extraordinarily'))
    maps = np.zeros((77, 4, 4), dtype=np.float32)
    for i in range(n_pieces):
        maps[2 + i] = float(i)  # pieces start at index 2 (after 'an' + SOS)
    ghm = GlobalHeatMap(tok, prompt, maps)
    whm = ghm.compute_word_heat_map('extraordinarily')
    np.testing.assert_allclose(np.asarray(whm.value),
                               np.full((4, 4), np.mean(range(n_pieces))), rtol=1e-6)


def test_parsed_heat_maps(tok):
    prompt = 'a blue dog'
    maps = np.random.RandomState(0).rand(77, 8, 8).astype(np.float32)
    ghm = GlobalHeatMap(tok, prompt, maps)
    parsed = list(ghm.parsed_heat_maps())
    texts = {p.token.text for p in parsed}
    assert 'blue' in texts and 'dog' in texts


def test_dependency_relations(tok):
    prompt = 'a blue dog runs'
    maps = np.random.RandomState(0).rand(77, 8, 8).astype(np.float32)
    ghm = GlobalHeatMap(tok, prompt, maps)
    pairs = list(ghm.dependency_relations())
    rels = {(p.dep_text, p.relation, p.head_text) for p in pairs}
    assert ('blue', 'amod', 'dog') in rels


def test_word_heat_map_expand_as(tok):
    import PIL.Image
    img = PIL.Image.new('RGB', (64, 64))
    hm = np.random.RandomState(0).rand(16, 16).astype(np.float32)
    whm = WordHeatMap(hm, 'dog')
    out = whm.expand_as(img)
    assert out.shape == (64, 64)
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6  # min-max normalized
    th = whm.expand_as(img, threshold=0.5)
    assert set(np.unique(th)).issubset({0.0, 1.0})


def test_word_heat_map_ioa():
    a = WordHeatMap(np.ones((8, 8), np.float32))
    b = WordHeatMap(np.ones((8, 8), np.float32))
    assert a.compute_ioa(b) == pytest.approx(1.0, abs=1e-6)


def test_plot_overlay_writes_file(tmp_path, tok):
    import PIL.Image
    img = PIL.Image.new('RGB', (32, 32), (128, 30, 40))
    hm = np.random.RandomState(0).rand(32, 32).astype(np.float32)
    out = tmp_path / 'overlay.png'
    plot_overlay_heat_map(img, hm, word='dog', out_file=out)
    assert out.exists() and out.stat().st_size > 0


def test_jet_composite_matches_stacked_alpha_compositing():
    """The single-pass composite equals the reference's two stacked imshow
    layers (jet heat map below, photo with per-pixel alpha 1-heat on top,
    daam/heatmap.py:20-53): over-compositing those reduces to
    photo*(1-heat) + jet(levels)*heat."""
    import matplotlib

    from daam_tpu.heatmap import _jet_composite

    rng = np.random.RandomState(3)
    photo_u8 = rng.randint(0, 256, (16, 16, 3), np.uint8)
    heat = rng.rand(16, 16).astype(np.float32) * 1.2 - 0.1  # incl. out-of-range

    for color_normalize in (True, False):
        if color_normalize:
            levels = (heat - heat.min()) / (heat.max() - heat.min())
        else:
            levels = np.clip(heat, 0, 1)
        jet = matplotlib.colormaps['jet'](levels)[..., :3]
        alpha = np.clip(1 - np.clip(heat, 0, 1), 0, 1)[..., None]
        photo = photo_u8.astype(np.float32) / 255
        expected = photo * alpha + jet * (1 - alpha)   # "over" compositing

        got = _jet_composite(photo_u8, heat if not color_normalize
                             else heat, color_normalize)
        np.testing.assert_allclose(got, np.clip(expected, 0, 1), atol=1e-6)
