import numpy as np
import pytest

from daam_tpu.tokenization import HashWordTokenizer
from daam_tpu.utils import compute_token_merge_indices, set_seed
from daam_tpu.nlp import cached_nlp, lemmatize, pos_tag


@pytest.fixture
def tok():
    return HashWordTokenizer()


def test_merge_indices_single_word(tok):
    idxs, _ = compute_token_merge_indices(tok, 'a dog runs', 'dog')
    # tokens: a, dog, runs -> dog at position 1, +1 for SOS = 2
    assert idxs == [2]


def test_merge_indices_multi_occurrence(tok):
    idxs, _ = compute_token_merge_indices(tok, 'dog chases dog', 'dog')
    assert idxs == [1, 3]


def test_merge_indices_subword_word(tok):
    prompt = 'an extraordinarily large dog'
    idxs, _ = compute_token_merge_indices(tok, prompt, 'extraordinarily')
    n_pieces = len(tok.tokenize('extraordinarily'))
    assert len(idxs) == n_pieces
    assert idxs == list(range(2, 2 + n_pieces))  # after 'an', +1 SOS offset


def test_merge_indices_case_insensitive(tok):
    idxs, _ = compute_token_merge_indices(tok, 'A Dog runs', 'DOG')
    assert idxs == [2]


def test_merge_indices_missing_raises(tok):
    with pytest.raises(ValueError):
        compute_token_merge_indices(tok, 'a dog runs', 'cat')


def test_merge_indices_explicit_word_idx(tok):
    idxs, widx = compute_token_merge_indices(tok, 'a dog runs', 'ignored', word_idx=5)
    assert idxs == [6] and widx == 5


def test_set_seed_deterministic():
    import jax
    k1 = set_seed(42)
    k2 = set_seed(42)
    assert (np.asarray(k1) == np.asarray(k2)).all()
    x1 = jax.random.normal(k1, (4,))
    x2 = jax.random.normal(k2, (4,))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_nlp_pos_tags():
    doc = cached_nlp('A blue car driving through the city')
    tags = {t.text.lower(): t.pos_ for t in doc}
    assert tags['blue'] == 'ADJ'
    assert tags['car'] == 'NOUN'
    assert tags['the'] == 'DET'
    assert tags['through'] == 'ADP'
    assert tags['driving'] == 'VERB'


def test_nlp_dependency_structure():
    doc = cached_nlp('A blue car driving through the city')
    by_text = {t.text.lower(): t for t in doc}
    assert by_text['blue'].dep_ == 'amod'
    assert by_text['blue'].head.text.lower() == 'car'
    roots = [t for t in doc if t.dep_ == 'ROOT']
    assert len(roots) == 1


def test_lemmatize():
    assert lemmatize('dogs') == 'dog'
    assert lemmatize('running') == 'run'
    assert lemmatize('cities') == 'city'
    assert lemmatize('glasses') == 'glass'


def test_pos_tag_numerals():
    assert pos_tag('three') == 'NUM'
    assert pos_tag('7') == 'NUM'
