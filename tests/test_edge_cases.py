"""Edge-case coverage: tokenizer regex corners, merge indices, demo helpers."""

import numpy as np
import pytest

from daam_tpu.tokenization import HashWordTokenizer, WORD_PATTERN
from daam_tpu.utils import compute_token_merge_indices


@pytest.fixture
def tok():
    return HashWordTokenizer()


def test_contractions_split(tok):
    toks = [t.replace('</w>', '') for t in tok.tokenize("it's the dog's day")]
    assert "'s" in toks
    assert toks.count("'s") == 2


def test_digits_split_individually(tok):
    toks = [t.replace('</w>', '') for t in tok.tokenize('a 42 dogs')]
    assert '4' in toks and '2' in toks and '42' not in toks


def test_punctuation_runs(tok):
    toks = [t.replace('</w>', '') for t in tok.tokenize('wait... what?!')]
    assert '...' in toks
    assert '?!' in toks


def test_unicode_words(tok):
    toks = tok.tokenize('café naïve')
    assert len(toks) == 2
    assert all(t.endswith('</w>') for t in toks)


def test_merge_indices_offset(tok):
    idxs, _ = compute_token_merge_indices(tok, 'dog dog dog', 'dog',
                                          offset_idx=1)
    # offset shifts match starts; occurrences at positions 1,2 (+1 SOS)
    assert idxs == [2, 3, 4]


def test_merge_indices_phrase(tok):
    # multi-word search term matches as a token run
    idxs, _ = compute_token_merge_indices(tok, 'a hot dog here', 'hot dog')
    assert idxs == [2, 3]


def test_prompt_with_punct_spacing(tok):
    """The CLI's punctuation spacing hack ('x ,' / 'x .') must stay findable."""
    prompt = 'A dog , a cat .'
    idxs, _ = compute_token_merge_indices(tok, prompt, 'cat')
    toks = [t.replace('</w>', '') for t in tok.tokenize(prompt.lower())]
    assert toks[idxs[0] - 1] == 'cat'


def test_empty_word_raises(tok):
    with pytest.raises(ValueError):
        compute_token_merge_indices(tok, 'a dog', '')


def test_word_pattern_matches_clip_examples():
    assert WORD_PATTERN.findall('<|startoftext|>hi<|endoftext|>')[0] == '<|startoftext|>'


def test_demo_dependency_svg():
    """The displaCy-style parse render: inline SVG with word labels, POS
    tags, and at least one labeled arc; markup-unsafe text is escaped."""
    from daam_tpu.run.demo import dependency_html
    svg = dependency_html('a dog runs')
    assert svg.startswith('<svg') and 'dog' in svg
    assert 'dep-arc' in svg and 'dep-pos' in svg
    # markup-unsafe token text is escaped ('<' tokenizes separately and must
    # render as &lt;, never as a raw angle bracket inside a text node)
    hostile = dependency_html('a <b> dog')
    assert '&lt;' in hostile and '&gt;' in hostile
