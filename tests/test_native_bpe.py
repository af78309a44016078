"""Native C++ BPE tokenizer: parity with the Python implementation."""

import json

import pytest

from daam_tpu.tokenization import ClipBpeTokenizer, default_tokenizer


@pytest.fixture(scope='module')
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('vocab')
    base = list('abcdefghijklmnopqrstuvwxyz.,!?\'0123456789')
    vocab = {}
    for t in base:
        vocab[t] = len(vocab)
        vocab[t + '</w>'] = len(vocab)
    merges = [('d', 'o'), ('do', 'g</w>'), ('r', 'u'), ('ru', 'n'),
              ('run', 's</w>'), ('run', 'n'), ('runn', 'i'), ('runni', 'n'),
              ('runnin', 'g</w>'), ('t', 'h'), ('th', 'e</w>'), ('a', '</w>'),
              ('c', 'a'), ('ca', 't</w>'), ("'", 's</w>')]
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    (d / 'vocab.json').write_text(json.dumps(vocab))
    (d / 'merges.txt').write_text(
        '#version: 0.2\n' + '\n'.join(f'{a} {b}' for a, b in merges))
    return d


@pytest.fixture(scope='module')
def both(vocab_dir):
    from daam_tpu.native import NativeBpeTokenizer, native_available
    if not native_available():
        pytest.skip('native BPE not buildable')
    py = ClipBpeTokenizer.from_pretrained(vocab_dir)
    cc = NativeBpeTokenizer.from_pretrained(vocab_dir)
    return py, cc


@pytest.mark.parametrize('text', [
    'the dog runs',
    'A Dog, RUNNING!   fast',
    "the dog's cat",
    'dq zz xx',
    '3 dogs and 42 cats.',
    '',
    '   ',
    'the the the dog dog',
])
def test_tokenize_parity(both, text):
    py, cc = both
    assert cc.tokenize(text) == py.tokenize(text)


@pytest.mark.parametrize('text', ['the dog runs', 'a cat', ''])
def test_encode_parity(both, text):
    py, cc = both
    assert cc.encode(text) == py.encode(text)


def test_convert_tokens_to_ids_parity(both):
    py, cc = both
    toks = py.tokenize('the dog runs') + ['<|startoftext|>', 'zz-not-a-token']
    assert cc.convert_tokens_to_ids(toks) == py.convert_tokens_to_ids(toks)


def test_call_parity(both):
    py, cc = both
    a = py(['the dog', 'a cat runs'], return_tensors='np')
    b = cc(['the dog', 'a cat runs'], return_tensors='np')
    assert (a['input_ids'] == b['input_ids']).all()
    assert (a['attention_mask'] == b['attention_mask']).all()


def test_default_tokenizer_prefers_native(vocab_dir):
    from daam_tpu.native import native_available
    tok = default_tokenizer(vocab_dir)
    if native_available():
        from daam_tpu.native import NativeBpeTokenizer
        assert isinstance(tok, NativeBpeTokenizer)
    assert tok.tokenize('dog') == ['dog</w>']


def test_native_throughput_advantage(both):
    """The native core should beat the Python BPE clearly on batch workloads."""
    import time
    py, cc = both
    texts = ['the dog runs and the cat runs faster than the dog'] * 200
    # warm caches
    for t in texts[:2]:
        py.tokenize(t); cc.tokenize(t)
    t0 = time.perf_counter()
    for t in texts:
        py.encode(t)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts:
        cc.encode(t)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py  # strictly faster; typically ~10-30x


def test_native_tokenizer_pickles(both):
    """Pickle round-trip reconstructs the native handle from the vocab paths
    (reference ``GenerationExperiment.save`` pickles its tokenizer, so the
    native tokenizer must survive torch.save/torch.load)."""
    import pickle
    _, cc = both
    cc2 = pickle.loads(pickle.dumps(cc))
    text = 'A Dog, RUNNING!   fast'
    assert cc2.tokenize(text) == cc.tokenize(text)
    assert cc2.encode(text) == cc.encode(text)
