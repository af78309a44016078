"""``daam`` CLI — batch generation with heat-map tracing.

TPU-native counterpart of reference ``daam/run/generate.py``: same eight
actions (``quickgen``, ``prompt``, ``coco``, ``coco-unreal``, ``template``,
``cconj``, ``stdin``, ``regenerate``, reference ``generate.py:22``), same model
registry names (``generate.py:23-30``), same per-experiment artifact contract.
Extensions for the TPU world: ``--tiny`` (random-weight fixture for smoke
runs), ``--from-path`` (local diffusers checkpoint dir), ``--batch-size``
(data-parallel batched tracing — the reference is single-prompt only),
``--scheduler`` and ``--dtype``.
"""

from collections import defaultdict
from pathlib import Path
import argparse
import json
import random
import sys
import time

from PIL import Image
import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # offline/minimal env: no-op progress shim
    class tqdm:  # noqa: N801 - drop-in stand-in
        def __init__(self, total=None, **kwargs):
            self.total = total

        def update(self, n=1):
            pass

        @staticmethod
        def write(msg):
            print(msg)

        def close(self):
            pass

from ..experiment import GenerationExperiment, build_word_list_coco80
from ..nlp import cached_nlp, lemmatize
from ..trace import trace
from ..utils import set_seed

ACTIONS = ['quickgen', 'prompt', 'coco', 'template', 'cconj', 'coco-unreal',
           'stdin', 'regenerate']
MODEL_ID_MAP = {
    'v1': 'v1',
    'v2-base': 'v2-base',
    'v2-large': 'v2-large',
    'v2-1-base': 'v2-1-base',
    'v2-1-large': 'v2-1-large',
    'xl-base-1.0': 'xl-base-1.0',
}

_PLURAL_NUMERALS = {'0', '2', '3', '4', '5', '6', '7', '8', '9', 'zero', 'two',
                    'three', 'four', 'five', 'six', 'seven', 'eight', 'nine'}


def _pluralize(word: str) -> str:
    """Small built-in pluralizer (the reference shells out to ``inflect``)."""
    if word.endswith(('s', 'sh', 'ch', 'x', 'z')):
        return word + 'es'
    if word.endswith('y') and len(word) > 1 and word[-2] not in 'aeiou':
        return word[:-1] + 'ies'
    if word.endswith('f'):
        return word[:-1] + 'ves'
    if word.endswith('fe'):
        return word[:-2] + 'ves'
    return word + 's'


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog='daam')
    parser.add_argument('prompt', nargs='?', type=str)
    parser.add_argument('--action', '-a', type=str, choices=ACTIONS,
                        default=ACTIONS[0])
    parser.add_argument('--low-memory', action='store_true')
    parser.add_argument('--model', type=str, default='v2-1-base',
                        choices=list(MODEL_ID_MAP.keys()))
    parser.add_argument('--output-folder', '-o', type=str)
    parser.add_argument('--input-folder', '-i', type=str, default='input')
    parser.add_argument('--seed', '-s', type=int, default=0)
    parser.add_argument('--gen-limit', type=int, default=1000)
    parser.add_argument('--template', type=str, default='{numeral} {noun}')
    parser.add_argument('--template-data-file', '-tdf', type=str,
                        default='template.tsv')
    parser.add_argument('--seed-offset', type=int, default=0)
    parser.add_argument('--num-timesteps', '-n', type=int, default=30)
    parser.add_argument('--all-heads', action='store_true')
    parser.add_argument('--time-maps', action='store_true',
                        help='also save one heat map per denoising step and '
                             'word (files time{S}-{word}.heat_map.png plus '
                             'an animated {word}.time.gif); uses cheap '
                             'accumulator snapshots unless --save-heads')
    parser.add_argument('--time-chunk', type=int, default=1,
                        help='steps per --time-maps frame on the snapshot '
                             'path (1 = every step)')
    parser.add_argument('--word', type=str)
    parser.add_argument('--random-seed', action='store_true')
    parser.add_argument('--truth-only', action='store_true')
    parser.add_argument('--save-heads', action='store_true')
    parser.add_argument('--load-heads', action='store_true')
    parser.add_argument('--reference-format', action='store_true',
                        help='write generation.pt as a torch checkpoint the '
                             'reference daam tooling can load (needs torch)')
    # TPU-native extensions
    parser.add_argument('--tiny', action='store_true',
                        help='random-weight tiny fixture (smoke tests, no checkpoints)')
    parser.add_argument('--from-path', type=str, default=None,
                        help='local diffusers checkpoint directory')
    parser.add_argument('--scheduler', type=str, default='ddim',
                        choices=['ddim', 'pndm', 'euler', 'dpm++'])
    parser.add_argument('--dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--batch-size', type=int, default=1,
                        help='prompts traced per pipeline call (batched tracing)')
    return parser


def read_template_tsv(path: str):
    """word<TAB>pos TSV → {pos: [words]} (reference uses pandas; stdlib here)."""
    sample_dict = defaultdict(list)
    with open(path) as f:
        header = f.readline().strip().split('\t')
        w_idx, p_idx = header.index('word'), header.index('pos')
        for line in f:
            parts = line.rstrip('\n').split('\t')
            if len(parts) > max(w_idx, p_idx):
                sample_dict[parts[p_idx]].append(parts[w_idx])
    return sample_dict


def collect_prompts(args):
    """Action dispatch → list of (prompt_id, prompt), plus per-prompt seeds."""
    seeds = []
    if args.action.startswith('coco'):
        with (Path(args.input_folder) / 'captions_val2014.json').open() as f:
            captions = json.load(f)['annotations']
        random.shuffle(captions)

        if args.action == 'coco-unreal':
            # Shuffle ADJ/NOUN words across captions (reference
            # ``generate.py:65-92``): every ADJ/NOUN is replaced by a random
            # same-POS token drawn from the whole corpus.
            pos_map = defaultdict(list)
            for caption in captions:
                for tok in cached_nlp(caption['caption']):
                    if tok.pos_ in ('ADJ', 'NOUN'):
                        pos_map[tok.pos_].append(tok)
            for caption in captions:
                new_tokens = []
                for tok in cached_nlp(caption['caption']):
                    if tok.pos_ in ('ADJ', 'NOUN') and pos_map[tok.pos_]:
                        chosen = random.choice(pos_map[tok.pos_])
                        new_tokens.append(chosen.text + tok.whitespace_)
                    else:
                        new_tokens.append(tok.text_with_ws)
                caption['caption'] = ''.join(new_tokens)

        prompts = [(caption['id'], caption['caption']) for caption in captions]
    elif args.action == 'stdin':
        prompts = [(idx, line.strip()) for idx, line in enumerate(sys.stdin)]
    elif args.action == 'template':
        sample_dict = read_template_tsv(args.template_data_file)
        prompts = []
        template_words = args.template.split()
        for prompt_id in range(args.gen_limit):
            words = []
            pluralize = False
            for word in template_words:
                if word.startswith('{'):
                    pos = word[1:-1]
                    word = random.choice(sample_dict[pos])
                    if pos == 'noun' and pluralize:
                        word = _pluralize(word)
                words.append(word)
                pluralize = word in _PLURAL_NUMERALS
            prompts.append((str(prompt_id), ' '.join(words)))
    elif args.action == 'cconj':
        words_map = build_word_list_coco80()
        prompts = []
        for idx in range(args.gen_limit):
            use_cohyponym = random.random() < 0.5
            if use_cohyponym:
                c = random.choice(list(words_map.keys()))
                w1, w2 = np.random.choice(words_map[c], 2, replace=False)
            else:
                c1, c2 = np.random.choice(list(words_map.keys()), 2, replace=False)
                w1 = random.choice(words_map[c1])
                w2 = random.choice(words_map[c2])
            prompt_id = f'{"cohypo" if use_cohyponym else "diff"}-{idx}'
            a1 = 'an' if w1[0] in 'aeiou' else 'a'
            a2 = 'an' if w2[0] in 'aeiou' else 'a'
            prompts.append((prompt_id, f'{a1} {w1} and {a2} {w2}'))
    elif args.action == 'quickgen':
        if args.output_folder is None:
            args.output_folder = '.'
        prompts = [('.', args.prompt)]
    elif args.action == 'regenerate':
        prompts = []
        for exp_folder in sorted(Path(args.input_folder).iterdir()):
            if not exp_folder.is_dir():
                continue
            if args.truth_only and not GenerationExperiment.contains_truth_mask(exp_folder):
                continue
            prompts.append((exp_folder.name,
                            GenerationExperiment.read_prompt(exp_folder)))
            seeds.append(GenerationExperiment.read_seed(exp_folder))
        if args.output_folder is None:
            args.output_folder = args.input_folder
    else:  # prompt (interactive)
        prompts = [('prompt', input('> '))]

    if args.output_folder is None:
        args.output_folder = 'output'
    return prompts, seeds


def filter_by_lemma(prompts, lemma):
    """Keep prompts containing the target word exactly once (by lemma),
    reference ``generate.py:175-193``."""
    kept = []
    for prompt_id, prompt in prompts:
        if lemma not in prompt.lower():
            continue
        count = sum(1 for tok in cached_nlp(prompt)
                    if tok.lemma_.lower() == lemma)
        if count == 1:
            kept.append((prompt_id, prompt))
    return kept


def load_pipeline(args):
    import jax.numpy as jnp
    from ..pipeline.sd import StableDiffusionPipeline

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    if args.tiny:
        name = 'tiny-xl' if 'xl' in args.model else 'tiny'
        return StableDiffusionPipeline.from_pretrained(
            name, scheduler=args.scheduler, dtype=dtype)
    source = args.from_path or MODEL_ID_MAP[args.model]
    return StableDiffusionPipeline.from_pretrained(
        source, scheduler=args.scheduler, dtype=dtype)


def main(argv=None):
    from ..utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    args = build_parser().parse_args(argv)
    args.lemma = (cached_nlp(args.word)[0].lemma_ if args.word else None)

    prompts, seeds = collect_prompts(args)
    if args.lemma is not None:
        prompts = filter_by_lemma(prompts, args.lemma)
    prompts = prompts[:args.gen_limit]

    pipe = load_pipeline(args)

    # Batch prompts into pipeline calls (batch tracing is a TPU-side
    # extension; batch_size=1 reproduces the reference exactly).  Corpus runs
    # (coco/template: up to --gen-limit prompts) get a tqdm progress bar like
    # the reference main loop (``daam/run/generate.py:210``).
    progress = tqdm(total=len(prompts), unit='img', desc='daam generate',
                    disable=len(prompts) <= 1)
    # --random-seed: one time-derived base per run, offset by sample index.
    # Per-sample int(time.time()) (the reference's form, generate.py:160)
    # would give every sample generated in the same second — i.e. a whole
    # batched chunk — the same PRNGKey and identical initial latents.
    random_seed_base = int(time.time())
    for gen_idx in range(0, len(prompts), args.batch_size):
        chunk = prompts[gen_idx:gen_idx + args.batch_size]
        chunk_seeds = []
        chunk_prompts = []
        for offset, (prompt_id, prompt) in enumerate(chunk):
            prompt = prompt.replace(',', ' ,').replace('.', ' .').strip()
            idx = gen_idx + offset
            seed = random_seed_base + idx if args.random_seed else args.seed
            if seeds and idx < len(seeds):
                seed = seeds[idx]
            if args.action == 'cconj':
                seed = int(str(chunk[offset][0]).split('-')[1]) + args.seed_offset
            chunk_prompts.append((str(prompt_id), prompt, seed))
            chunk_seeds.append(seed)

        # One PRNG key per sample: a prompt's noise depends only on its own
        # seed, so regeneration reproduces exactly at any --batch-size.
        import jax.numpy as jnp
        gen = jnp.stack([set_seed(s) for s in chunk_seeds])
        batch = [p for _, p, _ in chunk_prompts]
        # --time-maps without --save-heads rides the cheap accumulator
        # snapshots (per-chunk diffs; no probability buffer).
        time_chunk = (args.time_chunk if args.time_maps and
                      not (args.save_heads or args.load_heads) else None)
        with trace(pipe, low_memory=args.low_memory, save_heads=args.save_heads,
                   load_heads=args.load_heads,
                   time_chunk_steps=time_chunk) as tc:
            out = pipe(batch if len(batch) > 1 else batch[0],
                       num_inference_steps=args.num_timesteps, generator=gen,
                       callback=tc.time_callback)

            for offset, (prompt_id, prompt, seed) in enumerate(chunk_prompts):
                exp = tc.to_experiment(args.output_folder, id=prompt_id,
                                       seed=seed, batch_idx=offset)
                exp.image = out.images[offset]
                exp.save(args.output_folder,
                         heat_maps=args.action == 'quickgen',
                         reference_format=args.reference_format)

                if args.all_heads:
                    exp.clear_checkpoint()

                for word in prompt.split():
                    if args.lemma is not None and \
                            cached_nlp(word)[0].lemma_.lower() != args.lemma:
                        continue
                    try:
                        exp.save_heat_map(word)
                    except ValueError:
                        continue

                    if args.all_heads:
                        save_all_heads(tc, args, prompt_id, prompt, seed, word,
                                       out.images[offset])
                    if args.time_maps:
                        save_time_maps(tc, args, prompt_id, prompt, seed, word,
                                       out.images[offset], batch_idx=offset)
                progress.update(1)
                progress.write(f'[daam] {prompt_id}: {prompt!r} -> '
                               f'{Path(args.output_folder) / prompt_id}')
    progress.close()


def save_time_maps(tc, args, prompt_id, prompt, seed, word, image,
                   batch_idx=0):
    """Per-denoising-step heat maps for one word (no reference analog).
    Sources: cheap accumulator snapshots (default; ``--time-chunk`` steps
    per frame) or the exact ``--save-heads`` replay buffer."""
    try:
        per_step = tc.compute_time_global_heat_maps(batch_idx=batch_idx)
    except RuntimeError as e:
        print(f'[daam] --time-maps skipped: {e}')
        return
    frames = []
    for s, hm in enumerate(per_step):
        exp = GenerationExperiment(
            path=Path(args.output_folder),
            id=str(prompt_id),
            global_heat_map=np.asarray(hm.heat_maps),
            seed=seed,
            prompt=prompt,
            image=image,
            tokenizer=tc.pipe.tokenizer,
        )
        frames.append(exp.save_heat_map(word, output_prefix=f'time{s:03d}-'))
    if not frames:
        return

    def _load(path):
        with Image.open(path) as im:
            return im.convert('RGB')

    # RGB frames: Pillow derives one shared palette at save time, avoiding the
    # per-frame-adaptive-palette color drift older Pillows show on appended
    # P-mode frames.  A single frame still writes a (one-frame) GIF.
    first, *rest = (_load(p) for p in frames)
    first.save(frames[0].parent / f'{word.lower()}.time.gif',
               save_all=True, append_images=rest, duration=150, loop=0)


def save_all_heads(tc, args, prompt_id, prompt, seed, word, image):
    """Per-(head, layer) heat maps (reference ``generate.py:239-255``).

    The reference hardcodes ``range(16)`` heads, silently skipping SDXL's
    heads 16-19 at the 20-head levels; here each layer sweeps its real head
    count from the located layout (``tc.layer_heads``)."""
    for layer_idx, (layer_name, n_heads) in enumerate(
            zip(tc.layer_names, tc.layer_heads)):
        for head_idx in range(n_heads):
            try:
                heat_map = tc.compute_global_heat_map(layer_idx=layer_idx,
                                                      head_idx=head_idx)
                exp = GenerationExperiment(
                    path=Path(args.output_folder),
                    id=str(prompt_id),
                    global_heat_map=np.asarray(heat_map.heat_maps),
                    seed=seed,
                    prompt=prompt,
                    image=image,
                    tokenizer=tc.pipe.tokenizer,
                )
                exp.save_heat_map(
                    word, output_prefix=f'l{layer_idx}-{layer_name}-h{head_idx}-')
            except RuntimeError:
                print(f'Missing ({layer_idx}, {head_idx}, {layer_name})')


if __name__ == '__main__':
    main()
