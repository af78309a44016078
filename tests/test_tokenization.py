import json

import numpy as np
import pytest

from daam_tpu.tokenization import (ClipBpeTokenizer, HashWordTokenizer,
                                   default_tokenizer, SOT_ID, EOT_ID)


@pytest.fixture
def hash_tok():
    return HashWordTokenizer()


@pytest.fixture
def bpe_tok():
    # Tiny handmade BPE vocab exercising multi-merge tokenization.
    base_tokens = ['d', 'o', 'g', 'r', 'u', 'n', 's', 'a', 'c', 'e', 'f', 'i',
                   'l', 'h', 't', 'w', 'p', 'm', 'b', 'x', 'y', 'z', 'k', 'j',
                   'q', 'v', '.', ',']
    vocab = {}
    for t in base_tokens:
        vocab[t] = len(vocab)
        vocab[t + '</w>'] = len(vocab)
    merges = [('d', 'o'), ('do', 'g</w>'), ('r', 'u'), ('ru', 'n'),
              ('run', 's</w>'), ('run', 'n'), ('runn', 'i'), ('runni', 'n'),
              ('runnin', 'g</w>'), ('t', 'h'), ('th', 'e</w>'), ('a', '</w>')]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    return ClipBpeTokenizer(vocab, merges)


def test_hash_tokenize_marks_word_ends(hash_tok):
    toks = hash_tok.tokenize('A dog runs')
    assert toks == ['a</w>', 'dog</w>', 'runs</w>']


def test_hash_tokenize_long_word_subwords(hash_tok):
    toks = hash_tok.tokenize('extraordinarily')
    assert len(toks) > 1
    assert toks[-1].endswith('</w>')
    assert all(not t.endswith('</w>') for t in toks[:-1])
    assert ''.join(t.replace('</w>', '') for t in toks) == 'extraordinarily'


def test_hash_ids_stable_and_in_range(hash_tok):
    ids1 = hash_tok.convert_tokens_to_ids(hash_tok.tokenize('a dog'))
    ids2 = HashWordTokenizer().convert_tokens_to_ids(hash_tok.tokenize('a dog'))
    assert ids1 == ids2
    assert all(0 < i < hash_tok.vocab_size for i in ids1)


def test_encode_pads_to_77(hash_tok):
    out = hash_tok('a dog', return_tensors='np')
    assert out['input_ids'].shape == (1, 77)
    ids = out['input_ids'][0]
    assert ids[0] == SOT_ID
    n = int(out['attention_mask'][0].sum())
    assert ids[n - 1] == EOT_ID
    assert (ids[n:] == hash_tok.pad_id).all()


def test_encode_truncates(hash_tok):
    long_prompt = ' '.join(['word'] * 200)
    ids = hash_tok.encode(long_prompt)
    assert len(ids) == 77


def test_bpe_merges(bpe_tok):
    assert bpe_tok.tokenize('dog') == ['dog</w>']
    assert bpe_tok.tokenize('runs') == ['runs</w>']
    assert bpe_tok.tokenize('running') == ['running</w>']
    assert bpe_tok.tokenize('the dog') == ['the</w>', 'dog</w>']


def test_bpe_unmerged_falls_to_chars(bpe_tok):
    toks = bpe_tok.tokenize('dq')
    assert toks == ['d', 'q</w>']


def test_bpe_lowercases(bpe_tok):
    assert bpe_tok.tokenize('DOG') == bpe_tok.tokenize('dog')


def test_bpe_roundtrip_from_files(tmp_path, bpe_tok):
    (tmp_path / 'vocab.json').write_text(json.dumps(bpe_tok.encoder))
    (tmp_path / 'merges.txt').write_text(
        '#version: 0.2\n' + '\n'.join(f'{a} {b}' for (a, b), _ in
                                      sorted(bpe_tok.bpe_ranks.items(),
                                             key=lambda kv: kv[1])))
    tok2 = ClipBpeTokenizer.from_pretrained(tmp_path)
    assert tok2.tokenize('the dog running') == bpe_tok.tokenize('the dog running')
    assert default_tokenizer(tmp_path).tokenize('dog') == ['dog</w>']


def test_default_tokenizer_resolution(tmp_path, monkeypatch):
    import daam_tpu.tokenization as T

    # no checkpoint files -> the bundled full-size CLIP-format vocab
    tok = default_tokenizer(tmp_path)
    assert not isinstance(tok, HashWordTokenizer)
    assert tok.sot_id == 49406 and tok.eot_id == 49407
    # instance cache: same (path, pad_id) returns the same object
    assert default_tokenizer(tmp_path) is tok

    # without the bundled vocab -> hash fallback
    monkeypatch.setattr(T, 'BUNDLED_VOCAB_DIR', tmp_path / 'nope')
    assert isinstance(default_tokenizer(tmp_path), HashWordTokenizer)


def test_against_transformers_clip_if_available(hash_tok):
    """If transformers ships a cached CLIP tokenizer, compare surface behavior."""
    pytest.importorskip('transformers')
    # No network: we only check our regex splits words like CLIP's pattern does.
    toks = hash_tok.tokenize("a dog's tail, isn't it?")
    joined = [t.replace('</w>', '') for t in toks]
    assert "'s" in joined and ',' in joined and '?' in joined


def test_underscore_tokenizes_as_punctuation():
    """ADVICE r1: CLIP's pre-tokenizer treats '_' as punctuation
    ([^\\s\\p{L}\\p{N}]+); dropping it shifts token indices."""
    from daam_tpu.tokenization import WORD_PATTERN

    pieces = WORD_PATTERN.findall('snake_case words here')
    assert pieces[:3] == ['snake', '_', 'case']
    # runs of mixed punctuation including underscores survive
    assert WORD_PATTERN.findall('a __!! b') == ['a', '__!!', 'b']
