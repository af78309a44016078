"""Real-vocab BPE parity against HuggingFace ``CLIPTokenizer`` (VERDICT r2 #2).

Round 2 proved the BPE algorithm on a 10-token synthetic vocab only.  These
tests load the full-size 49,408-entry CLIP-format vocabulary learned offline
by ``scripts/learn_clip_bpe.py`` (``daam_tpu/data/clip-bpe/``; same file format and
shape as OpenAI's — 256 byte symbols, 256 ``byte</w>``, 48,894 merges,
2 specials) into the *actual* ``transformers.CLIPTokenizer`` and require
token-for-token agreement from both our Python BPE and the native C++ BPE
over a corpus of punctuation/unicode/contraction-heavy prompts.

Two HF configurations are covered:

* the canonical ftfy path (``fix_text`` pinned to identity — ftfy is a no-op
  on well-formed text), which our ``tokenize`` implements
  (whitespace-clean + lower, reference behavior via ``daam/utils.py:73-91``);
* the environment's no-ftfy ``BasicTokenizer`` fallback, which agrees on
  ASCII text (it additionally strips control chars and spaces out CJK runs).
"""

from pathlib import Path

import pytest

transformers = pytest.importorskip('transformers')

from daam_tpu.tokenization import ClipBpeTokenizer  # noqa: E402

from daam_tpu.tokenization import BUNDLED_VOCAB_DIR as VOCAB_DIR

pytestmark = pytest.mark.skipif(
    not (VOCAB_DIR / 'vocab.json').exists(),
    reason='daam_tpu/data/clip-bpe not generated (scripts/learn_clip_bpe.py)')

# punctuation / unicode / contraction torture corpus (reference word-map
# queries live or die on exact subword behavior, daam/utils.py:73-91)
PROMPTS = [
    'A dog running across the field.',
    "it's a dog's life, isn't it? they're well-behaved... we'll see",
    'I\'d say you\'ve done it; I\'m sure they\'ll agree',
    'a red, white & blue car -- very fast!!! (and loud)',
    'UPPER case MiXeD Case lower case',
    'numbers 0 1 23 456 7,890 3.14159 1e-5 100%',
    'hyphen-ated words; semi_colons_and_underscores mixed-up',
    'quotes "double" \'single\' `back` and <angle> [square] {curly}',
    'café naïve résumé Zürich São Paulo œuvre',
    'emoji 😀 🐕 🔥 and symbols © ® ™ § ¶ † ∞ ≈ ≠',
    'currency £3.50 €42 ¥1000 $9.99 ¢5',
    'ｆｕｌｌｗｉｄｔｈ ｔｅｘｔ and ½ ¼ ¾ fractions',
    'white    space\ttabs\nnewlines   everywhere',
    'a photo of an astronaut riding a horse on the moon, 4k, detailed',
    'the quick brown fox jumps over the lazy dog',
    'supercalifragilisticexpialidocious antidisestablishmentarianism',
    'xqzj vwkp zzyzx qqq',              # junk words: byte-level fallback
    "don't can't won't shan't o'clock y'all",
    'ellipsis… dash— bullet• arrow→ math∑∏',
    'a.b.c.d e-mail@example.com http://x.y/z?q=1&r=2',
    '<|startoftext|> inline special <|endoftext|> tokens',
    'Ω≤ω ΑΒΓ αβγ ДЖИ джи عربى 日本語テキスト 中文文本',
]

ASCII_PROMPTS = [p for p in PROMPTS if p.isascii()]


@pytest.fixture(scope='module')
def hf_canonical():
    tok = transformers.CLIPTokenizer(str(VOCAB_DIR / 'vocab.json'),
                                     str(VOCAB_DIR / 'merges.txt'))
    # pin the canonical path: ftfy.fix_text is identity on well-formed text
    tok.fix_text = lambda s: s
    return tok


@pytest.fixture(scope='module')
def hf_no_ftfy():
    tok = transformers.CLIPTokenizer(str(VOCAB_DIR / 'vocab.json'),
                                     str(VOCAB_DIR / 'merges.txt'))
    assert tok.fix_text is None, 'ftfy unexpectedly installed'
    return tok


@pytest.fixture(scope='module')
def ours():
    return ClipBpeTokenizer.from_pretrained(VOCAB_DIR)


@pytest.fixture(scope='module')
def ours_native():
    from daam_tpu.native import NativeBpeTokenizer, native_available
    if not native_available():
        pytest.skip('native BPE extension not built')
    return NativeBpeTokenizer.from_pretrained(VOCAB_DIR)


def test_vocab_shape():
    """File invariants CLIPTokenizer assumes (tokenization_clip.py reads
    merges[1:48895])."""
    import json
    vocab = json.loads((VOCAB_DIR / 'vocab.json').read_text(encoding='utf-8'))
    assert len(vocab) == 49408
    assert vocab['<|startoftext|>'] == 49406
    assert vocab['<|endoftext|>'] == 49407
    merge_lines = (VOCAB_DIR / 'merges.txt').read_text(
        encoding='utf-8').strip().split('\n')
    assert merge_lines[0].startswith('#version')
    assert len(merge_lines) - 1 == 49152 - 256 - 2


@pytest.mark.parametrize('prompt', PROMPTS)
def test_tokenize_parity_python(hf_canonical, ours, prompt):
    assert ours.tokenize(prompt) == hf_canonical.tokenize(prompt)


@pytest.mark.parametrize('prompt', PROMPTS)
def test_tokenize_parity_native(hf_canonical, ours_native, prompt):
    assert ours_native.tokenize(prompt) == hf_canonical.tokenize(prompt)


def test_input_ids_parity(hf_canonical, ours):
    """__call__ contract: ids + SOS/EOS + pad-to-77 + truncation, exactly as
    the reference feeds the text encoder."""
    hf = hf_canonical(PROMPTS, padding='max_length', truncation=True,
                      max_length=77)
    got = ours(PROMPTS, padding='max_length', truncation=True, max_length=77)
    assert got['input_ids'] == hf['input_ids']


def test_input_ids_parity_native(hf_canonical, ours_native):
    hf = hf_canonical(PROMPTS, padding='max_length', truncation=True,
                      max_length=77)
    got = ours_native(PROMPTS, padding='max_length', truncation=True,
                      max_length=77)
    assert got['input_ids'] == hf['input_ids']


def test_truncation_parity_long_prompt(hf_canonical, ours):
    long_prompt = ' '.join(PROMPTS) * 3
    hf = hf_canonical([long_prompt], padding='max_length', truncation=True,
                      max_length=77)
    got = ours([long_prompt], padding='max_length', truncation=True,
               max_length=77)
    assert got['input_ids'] == hf['input_ids']
    assert len(got['input_ids'][0]) == 77


@pytest.mark.parametrize('prompt', ASCII_PROMPTS)
def test_tokenize_parity_no_ftfy_env(hf_no_ftfy, ours, prompt):
    """The environment's actual HF configuration (no ftfy installed) agrees
    with ours on ASCII prompts; its BasicTokenizer fallback only diverges on
    control characters and CJK run-splitting."""
    assert ours.tokenize(prompt) == hf_no_ftfy.tokenize(prompt)


def test_decode_matches_hf(hf_canonical, ours):
    """BPE decode is lossy on spacing (both implementations join tokens with
    single spaces at ``</w>`` boundaries); ours must be lossy exactly like
    HF's."""
    for prompt in ('a dog runs', 'hyphen-ated and 3.14'):
        ids = ours.encode(prompt)
        assert ours.decode(ids) == \
            hf_canonical.decode(ids, skip_special_tokens=True).strip()


def test_word_merge_indices_on_real_vocab(ours):
    """The word-map query contract (reference daam/utils.py:73-91) on the
    full-size vocab: multi-subword words resolve to contiguous index runs."""
    from daam_tpu.utils import compute_token_merge_indices
    prompt = 'a supercalifragilisticexpialidocious dog and a dog'
    merge, _ = compute_token_merge_indices(
        ours, prompt, 'supercalifragilisticexpialidocious')
    toks = ours.tokenize(prompt)
    assert len(merge) > 1                      # really multi-subword
    assert merge == list(range(merge[0], merge[0] + len(merge)))
    joined = ''.join(toks[i - 1] for i in merge).replace('</w>', '')
    assert joined == 'supercalifragilisticexpialidocious'
    merge_dog, _ = compute_token_merge_indices(ours, prompt, 'dog')
    assert len(merge_dog) == 2                 # both occurrences
