"""Learn a full-size CLIP-format BPE vocabulary from on-disk text.

The reference stack ships OpenAI's 49,408-entry CLIP vocabulary
(``vocab.json``/``merges.txt``) with every HF checkpoint; this air-gapped
environment has no copy, so we *learn* a same-shape vocabulary from text
available on the machine (Python stdlib + site-packages docstrings/comments,
/usr/share/doc) seeded with the caption vocabulary the CLI uses
(``data/vocab.tsv`` + the COCO-80 labels).

The output is format-identical to OpenAI's files and drop-in loadable by
``transformers.CLIPTokenizer``, our :class:`ClipBpeTokenizer`, and the native
C++ BPE:

* ``vocab.json``: 256 byte symbols, 256 ``byte</w>`` symbols, one entry per
  merge (in merge order), then ``<|startoftext|>`` (49406) and
  ``<|endoftext|>`` (49407) — 49,408 entries total.
* ``merges.txt``: ``#version: 0.2`` header + 48,894 merge lines — exactly the
  count ``CLIPTokenizer`` reads (``tokenization_clip.py``:
  ``merges[1 : 49152 - 256 - 2 + 1]``).

Learning is the classic frequency-greedy BPE (Sennrich et al.) over the
end-of-word symbol alphabet CLIP uses (word = chars, last char + '</w>'),
with a lazy max-heap and deterministic (count, pair) tie-breaking so the
output is reproducible run to run.

Usage: python scripts/learn_clip_bpe.py [-o daam_tpu/data/clip-bpe] [--target 48894]
"""

import argparse
import gzip
import heapq
import json
import re
import sys
import time
from collections import Counter, defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from daam_tpu.tokenization import (WORD_PATTERN, _whitespace_clean,  # noqa: E402
                                   bytes_to_unicode)

N_MERGES_CLIP = 49152 - 256 - 2  # 48,894: what CLIPTokenizer reads

CORPUS_ROOTS = [
    Path('/usr/local/lib/python3.12'),
    Path('/usr/lib/python3.11'),
    Path('/usr/share/doc'),
]


def iter_corpus_texts(max_file_bytes=2_000_000):
    for root in CORPUS_ROOTS:
        if not root.is_dir():
            continue
        for p in sorted(root.rglob('*')):
            try:
                if p.suffix in ('.py', '.txt', '.rst', '.md'):
                    if p.stat().st_size > max_file_bytes:
                        continue
                    yield p.read_text(encoding='utf-8', errors='ignore')
                elif p.name.endswith(('.txt.gz', '.md.gz', '.rst.gz')):
                    with gzip.open(p, 'rt', encoding='utf-8',
                                   errors='ignore') as f:
                        yield f.read(max_file_bytes)
            except OSError:
                continue


def seed_caption_words():
    """Caption-domain words get a strong prior so prompt-like text merges
    into few tokens (the vocab a captioning tokenizer would be trained on)."""
    words = []
    tsv = REPO / 'data' / 'vocab.tsv'
    if tsv.exists():
        for line in tsv.read_text().splitlines():
            w = line.split('\t')[0].strip().lower()
            if w:
                words.append(w)
    from daam_tpu.coco import COCO80_LABELS, COCOSTUFF27_LABELS
    for label in list(COCO80_LABELS) + list(COCOSTUFF27_LABELS):
        words.extend(label.lower().split())
    common = ('a an the of and or in on at with without running sitting '
              'standing eating looking wearing riding holding walking '
              'field city street road sky water grass tree man woman boy '
              'girl photo picture image close up view small large big red '
              'green blue yellow black white brown orange purple gray').split()
    words.extend(common)
    return words


def collect_word_freqs():
    byte_enc = bytes_to_unicode()
    freqs = Counter()
    n_texts = 0
    for text in iter_corpus_texts():
        n_texts += 1
        text = _whitespace_clean(text).lower()
        for chunk in WORD_PATTERN.findall(text):
            freqs[''.join(byte_enc[b] for b in chunk.encode('utf-8'))] += 1
    for w in seed_caption_words():
        for chunk in WORD_PATTERN.findall(w):
            freqs[''.join(byte_enc[b] for b in chunk.encode('utf-8'))] += 5000
    print(f'corpus: {n_texts} files, {len(freqs)} distinct words, '
          f'{sum(freqs.values())} tokens')
    return freqs


def learn_bpe(freqs, n_merges):
    """Greedy BPE with incremental pair counts and a lazy max-heap."""
    words = []   # list of [symbols_list, freq]
    for w, f in freqs.items():
        if not w:
            continue
        syms = list(w[:-1]) + [w[-1] + '</w>']
        words.append([syms, f])

    pair_counts = Counter()
    pair_words = defaultdict(set)   # pair -> set of word indices
    for idx, (syms, f) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(idx)

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges = []
    byte_syms = set(bytes_to_unicode().values())
    produced = set(byte_syms) | {s + '</w>' for s in byte_syms}
    produced |= {'<|startoftext|>', '<|endoftext|>'}
    t0 = time.time()

    while len(merges) < n_merges and heap:
        neg, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if cur <= 0:
            continue
        if -neg != cur:                     # stale entry: reinsert fresh
            heapq.heappush(heap, (-cur, pair))
            continue
        if pair[0] + pair[1] in produced:
            # two different merges may concatenate to the same string
            # (e.g. ('ab','c') and ('a','bc')); vocab.json maps strings to
            # single ids, so only the first can become an entry — drop the
            # later pair from consideration entirely.
            pair_counts[pair] = 0
            continue
        produced.add(pair[0] + pair[1])
        merges.append(pair)
        a, b = pair
        ab = a + b
        touched = Counter()
        for idx in list(pair_words[pair]):
            syms, f = words[idx]
            i = 0
            out = []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    if out:
                        touched[(out[-1], a)] -= f
                        touched[(out[-1], ab)] += f
                    if i + 2 < len(syms):
                        nxt = syms[i + 2]
                        # the right neighbor of the merge: the old (b, nxt)
                        # disappears; (ab, nxt) appears unless nxt starts
                        # another a,b occurrence handled next iteration
                        touched[(b, nxt)] -= f
                        touched[(ab, nxt)] += f
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx][0] = out
            for j in range(len(out) - 1):
                pair_words[(out[j], out[j + 1])].add(idx)
        pair_counts[pair] = 0
        for p, d in touched.items():
            if d == 0 or p == pair:
                continue
            pair_counts[p] = pair_counts.get(p, 0) + d
            if pair_counts[p] > 0:
                heapq.heappush(heap, (-pair_counts[p], p))
        del pair_words[pair]
        if len(merges) % 5000 == 0:
            print(f'  {len(merges)} merges, {time.time() - t0:.0f}s')
    return merges


def emit(merges, out_dir: Path):
    byte_syms = list(bytes_to_unicode().values())
    vocab_tokens = byte_syms + [s + '</w>' for s in byte_syms]
    vocab_tokens += [a + b for a, b in merges]
    vocab_tokens += ['<|startoftext|>', '<|endoftext|>']
    vocab = {}
    for i, tok in enumerate(vocab_tokens):
        if tok in vocab:
            raise RuntimeError(f'duplicate vocab entry {tok!r}')
        vocab[tok] = i
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / 'vocab.json').open('w', encoding='utf-8') as f:
        json.dump(vocab, f, ensure_ascii=False)
    with (out_dir / 'merges.txt').open('w', encoding='utf-8') as f:
        f.write('#version: 0.2\n')
        for a, b in merges:
            f.write(f'{a} {b}\n')
    print(f'wrote {len(vocab)} vocab entries, {len(merges)} merges '
          f'to {out_dir}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-o', '--out', default=str(REPO / 'daam_tpu' / 'data' / 'clip-bpe'))
    ap.add_argument('--target', type=int, default=N_MERGES_CLIP)
    args = ap.parse_args()

    freqs = collect_word_freqs()
    merges = learn_bpe(freqs, args.target)
    if len(merges) < args.target:
        print(f'WARNING: corpus exhausted at {len(merges)} merges '
              f'(target {args.target})')
    emit(merges, Path(args.out))


if __name__ == '__main__':
    main()
