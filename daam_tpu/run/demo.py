"""``daam-demo`` — interactive web demo with attention-transplant counterfactuals.

TPU-native counterpart of reference ``daam/run/demo.py``.  The reference uses
Gradio; this environment is offline, so the demo is a self-contained
``http.server`` app (no external deps) serving a single-page UI with:

* prompt box + example dropdown,
* per-word heat-map grid (from ``parsed_heat_maps``),
* adjective-replacement counterfactual via ``save_heads`` on the first
  generation + ``load_heads`` on the second (attention transplant with the
  same seed — reference ``demo.py:102-114``),
* a dependency-parse readout (the reference renders spaCy displaCy SVG).

If Gradio *is* importable, ``--gradio`` serves a Gradio Blocks app instead.
A ``threading.Lock`` serializes generations like the reference (``demo.py:69``).
"""

from pathlib import Path
from threading import Event, Lock, Thread
import argparse
import base64
import html as html_mod
import io
import json
import queue
import time
import urllib.parse

import PIL.Image
import numpy as np

from ..nlp import cached_nlp
from ..trace import trace
from ..utils import set_seed

MODEL_ID_MAP = {
    'v1': 'v1',
    'v2-base': 'v2-base',
    'v2-large': 'v2-large',
    'v2-1-base': 'v2-1-base',
    'v2-1-large': 'v2-1-large',
}

EXAMPLES = [
    'An angry, bald man doing research',
    'A bear and a moose',
    'A blue car driving through the city',
    'Monkey walking with hat',
    'A brown cat eating yummy cake for her birthday',
    'A brown fox, a white dog, and a blue wolf in a green field',
]


def get_tokenizing_mapping(prompt, tokenizer):
    """Group subword token indices into words via ``</w>`` markers
    (reference ``demo.py:25-41``)."""
    tokens = tokenizer.tokenize(prompt)
    merge_idxs, words = [], []
    curr_idxs, curr_word = [], ''
    for i, token in enumerate(tokens):
        curr_idxs.append(i + 1)  # +1 for the SOS token
        curr_word += token
        if '</w>' in token:
            merge_idxs.append(curr_idxs)
            curr_idxs = []
            words.append(curr_word[:-4])
            curr_word = ''
    return merge_idxs, words


def dependency_svg(text: str) -> str:
    """Inline displaCy-style dependency-parse SVG: tokens on a baseline with
    POS tags, labeled arcs from head to dependent with arrowheads (the analog
    of the reference's ``spacy.displacy.render``, ``daam/run/demo.py:18-22``).
    """
    from html import escape

    tokens = list(cached_nlp(text))
    if not tokens:
        return '<svg class="dep" width="40" height="40"></svg>'

    spacing = max(70, 18 * max(len(t.text) for t in tokens))
    x0, word_y = 30, 40  # arcs stack above word_y; computed after levels
    arcs = []
    max_level = 1
    for tok in tokens:
        if tok.head.i == tok.i:
            continue
        max_level = max(max_level, abs(tok.head.i - tok.i))
    word_y = 40 + 26 * max_level
    height = word_y + 45
    width = x0 * 2 + spacing * max(len(tokens) - 1, 1)

    words = []
    for i, tok in enumerate(tokens):
        x = x0 + i * spacing
        words.append(
            f'<text text-anchor="middle" x="{x}" y="{word_y}" '
            f'class="dep-word">{escape(tok.text)}'
            f'<tspan x="{x}" dy="18" class="dep-pos">{tok.pos_}</tspan></text>')

    for tok in tokens:
        i, j = tok.i, tok.head.i
        if i == j:
            continue
        xa = x0 + min(i, j) * spacing + 6
        xb = x0 + max(i, j) * spacing - 6
        top = word_y - 18 - 26 * abs(i - j)
        y = word_y - 16
        xm = (xa + xb) / 2
        # arrowhead sits at the dependent's end of the arc
        xd = xa if i < j else xb
        arcs.append(
            f'<path class="dep-arc" d="M{xa},{y} C{xa},{top} {xb},{top} '
            f'{xb},{y}" fill="none"/>'
            f'<polygon class="dep-arrow" points="{xd - 4},{y - 5} '
            f'{xd + 4},{y - 5} {xd},{y + 3}"/>'
            f'<text text-anchor="middle" x="{xm:.0f}" '
            f'y="{(top + y) / 2 + 2:.0f}" class="dep-label">'
            f'{escape(tok.dep_)}</text>')

    return (f'<svg class="dep" width="{width}" height="{height}" '
            f'xmlns="http://www.w3.org/2000/svg">' +
            ''.join(arcs) + ''.join(words) + '</svg>')


def dependency_html(text: str) -> str:
    """Dependency readout embedded in the page (displaCy-style SVG)."""
    return dependency_svg(text)


def _img_to_b64(pil_img) -> str:
    buf = io.BytesIO()
    pil_img.save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode()


def _overlay_b64(image, word_heat_map) -> str:
    """Render the word overlay to a base64 PNG (jet colormap, alpha=1-heat).

    Pixel-identical to ``WordHeatMap.plot_overlay`` (the same
    ``heatmap._jet_composite`` does the math) but composited directly in
    numpy and encoded with PIL — no matplotlib figure machinery, which
    BASELINE.md measured as the dominant host cost per request under
    concurrent load on a 1-core serving host."""
    from ..heatmap import _jet_composite

    heat = word_heat_map.expand_as(image)
    composite = _jet_composite(np.asarray(image), heat, color_normalize=True)
    pil = PIL.Image.fromarray((composite * 255).astype(np.uint8))
    return _img_to_b64(pil)


PAGE = """<!doctype html>
<html><head><title>DAAM-TPU: Attention Maps for Stable Diffusion</title>
<style>
body {{ font-family: sans-serif; margin: 2em; max-width: 1100px; }}
.grid {{ display: flex; flex-wrap: wrap; gap: 8px; }}
.cell {{ text-align: center; font-size: 13px; }}
img {{ max-width: 256px; }}
svg.dep {{ overflow: visible; }}
svg.dep .dep-word {{ font-size: 14px; fill: #222; }}
svg.dep .dep-pos {{ font-size: 11px; fill: #999; }}
svg.dep .dep-label {{ font-size: 10px; fill: #7766aa; }}
svg.dep .dep-arc {{ stroke: #7766aa; stroke-width: 1.2px; }}
svg.dep .dep-arrow {{ fill: #7766aa; }}
textarea {{ width: 60%; }}
</style></head>
<body>
<h1>DAAM-TPU: Attention Maps for Interpreting Stable Diffusion</h1>
<p>TPU-native rebuild of <a href="https://github.com/castorini/daam">DAAM</a>
(paper: <a href="http://arxiv.org/abs/2210.04885">What the DAAM</a>).</p>
<form method="post" action="/generate">
<p><textarea name="prompt" rows="2">{prompt}</textarea></p>
<p>Examples: <select name="example" onchange="this.form.prompt.value=this.value">
{examples}</select></p>
<p>Adjective to replace: <select name="choice">{adjectives}</select>
New adjective: <input name="new_adj" value="{new_adj}"/></p>
<p>Inference steps: <input name="steps" type="number" value="{steps}" min="1" max="50"/>
Random seed: <input name="random_seed" type="checkbox" {random_checked}/></p>
<p><button type="submit">Submit</button></p>
</form>
{results}
<h3>Dependency parse</h3>
{dep}
</body></html>"""


class BatchQueue:
    """Microbatching for concurrent demo requests.

    The reference serializes generations behind one lock (``daam/run/demo.py:69``)
    — correct, but on a TPU the chip is underutilized at batch 1 (measured:
    SD2.1 0.936 → 1.141 imgs/s/chip at batch 4, BASELINE.md).  Plain (non
    counterfactual) requests that arrive within ``window_s`` of each other
    coalesce into ONE traced pipeline call:

    * prompts pad to the fixed ``batch_size`` (repeat-last) so a single
      compiled program serves every load level — no shape polymorphism;
    * per-request seeds stay reproducible via stacked per-sample PRNG keys
      (the same mechanism as the CLI's batched corpus runs);
    * per-request heat maps come from ``compute_global_heat_map(batch_idx=i)``.
    """

    def __init__(self, pipe, batch_size: int, lock, window_s: float = 0.05):
        self.pipe = pipe
        self.batch_size = batch_size
        self.lock = lock
        self.window_s = window_s
        self._q = queue.Queue()
        self._thread = Thread(target=self._loop, daemon=True)
        self._thread.start()

    #: Backstop so a waiter can never hang forever even if the worker thread
    #: dies in a way the per-item guards miss (ADVICE r2).
    SUBMIT_TIMEOUT_S = 1800.0

    def submit(self, prompt: str, steps: int, seed: int):
        """Block until the request's generation completes; returns
        ``(image, GlobalHeatMap)``."""
        item = {'prompt': prompt, 'steps': steps, 'seed': seed, 'ev': Event()}
        self._q.put(item)
        if not item['ev'].wait(timeout=self.SUBMIT_TIMEOUT_S):
            raise TimeoutError('daam-demo batch worker did not respond')
        if 'error' in item:
            raise item['error']
        return item['image'], item['heat_map']

    def _loop(self):
        while True:
            batch = [self._q.get()]
            # monotonic: wall-clock (time.time) can step under NTP and
            # stretch/collapse the coalescing window (ADVICE r2)
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.batch_size:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=timeout))
                except queue.Empty:
                    break
            try:
                by_steps = {}
                for item in batch:  # one compiled signature per step count
                    by_steps.setdefault(item['steps'], []).append(item)
                for steps, items in by_steps.items():
                    self._run(steps, items)
            except BaseException as e:  # noqa: BLE001 - keep the worker alive
                # _run already guards its own body; this catches anything
                # outside it so the sole daemon worker never dies with
                # waiters left blocking (ADVICE r2).
                for item in batch:
                    if not item['ev'].is_set():
                        item.setdefault('error', e if isinstance(e, Exception)
                                        else RuntimeError(repr(e)))
                        item['ev'].set()

    def _run(self, steps, items):
        import jax
        import jax.numpy as jnp

        try:
            prompts = [it['prompt'] for it in items]
            seeds = [it['seed'] for it in items]
            while len(prompts) < self.batch_size:  # pad to the compiled batch
                prompts.append(prompts[-1])
                seeds.append(seeds[-1])
            keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
            with self.lock, trace(self.pipe) as tc:
                out = self.pipe(prompts, num_inference_steps=steps,
                                generator=keys)
                for i, it in enumerate(items):
                    it['image'] = out.images[i]
                    it['heat_map'] = tc.compute_global_heat_map(batch_idx=i)
        except Exception as e:  # deliver the failure to every waiter
            for it in items:
                it['error'] = e
        finally:
            for it in items:
                it['ev'].set()


def make_app(pipe, default_seed: int, batch_size: int = 1):
    """Build the request handler class bound to a pipeline.  ``batch_size > 1``
    turns on request microbatching for plain generations (see
    :class:`BatchQueue`); counterfactual (transplant) requests always run
    serialized like the reference."""
    import http.server

    lock = Lock()
    batcher = BatchQueue(pipe, batch_size, lock) if batch_size > 1 else None

    def render(prompt='An angry, bald man doing research', new_adj='',
               steps=10, random_seed=False, results=''):
        adjectives = [''] + [t.text for t in cached_nlp(prompt) if t.pos_ == 'ADJ']
        return PAGE.format(
            prompt=html_mod.escape(prompt),
            examples=''.join(f'<option value="{e}">{e}</option>' for e in EXAMPLES),
            adjectives=''.join(f'<option value="{a}">{a}</option>' for a in adjectives),
            new_adj=new_adj,
            steps=steps,
            random_checked='checked' if random_seed else '',
            results=results,
            dep=dependency_html(prompt),
        ).encode()

    def generate(prompt, choice, new_adj, steps, random_seed):
        """The reference's ``plot`` flow (``demo.py:77-158``)."""
        prompt = prompt.replace(',', ', ').replace('.', '. ')
        new_prompt = prompt
        if choice:
            if not new_adj:
                new_adj = '.'
            new_prompt = ' '.join(new_adj if tok.text == choice else tok.text
                                  for tok in cached_nlp(prompt))

        seed = int(time.time()) if random_seed else default_seed
        counterfactual = choice and new_prompt != prompt

        image2 = None
        evolution = None
        if batcher is not None and not counterfactual:
            # plain request: coalesce with concurrent ones into one traced call
            image, heat_map = batcher.submit(prompt, steps, seed)
        else:
            with lock:
                gen = set_seed(seed)
                with trace(pipe, save_heads=bool(counterfactual)) as tc:
                    out = pipe(prompt, num_inference_steps=steps, generator=gen)
                    heat_map = tc.compute_global_heat_map()
                    image = out.images[0]
                    if counterfactual:
                        # the transplant's replay buffer doubles as a
                        # per-step time series for the replaced word
                        evolution = tc.compute_time_global_heat_maps()

                if counterfactual:
                    gen = set_seed(seed)
                    with trace(pipe, load_heads=True):
                        out2 = pipe(new_prompt, num_inference_steps=steps,
                                    generator=gen)
                        image2 = out2.images[0]

        esc = html_mod.escape
        html = ['<h3>Images</h3><div class="grid">']
        html.append(f'<div class="cell"><img src="data:image/png;base64,'
                    f'{_img_to_b64(image)}"/><br/>{esc(prompt)}</div>')
        if image2 is not None:
            html.append(f'<div class="cell"><img src="data:image/png;base64,'
                        f'{_img_to_b64(image2)}"/><br/>{esc(new_prompt)} '
                        f'(transplanted attention)</div>')
        html.append('</div><h3>DAAM maps</h3><div class="grid">')
        for parsed in heat_map.parsed_heat_maps():
            b64 = _overlay_b64(image, parsed.word_heat_map)
            html.append(f'<div class="cell"><img src="data:image/png;base64,'
                        f'{b64}"/><br/>{esc(parsed.token.text)}</div>')
        html.append('</div>')
        if evolution is not None and choice:
            # up to 8 evenly spaced steps of the replaced word's attention
            n = len(evolution)
            idxs = sorted({round(i * (n - 1) / max(1, min(8, n) - 1))
                           for i in range(min(8, n))})
            html.append(f'<h3>Attention evolution: {esc(choice)}</h3>'
                        f'<div class="grid">')
            for s in idxs:
                wm = evolution[s].compute_word_heat_map(choice)
                b64 = _overlay_b64(image, wm)
                html.append(f'<div class="cell"><img src="data:image/png;'
                            f'base64,{b64}"/><br/>step {s + 1}/{n}</div>')
            html.append('</div>')
        return prompt, ''.join(html)

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send(self, body, code=200):
            self.send_response(code)
            self.send_header('Content-Type', 'text/html; charset=utf-8')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._send(render())

        def do_POST(self):
            length = int(self.headers.get('Content-Length', 0))
            data = urllib.parse.parse_qs(self.rfile.read(length).decode())
            prompt = data.get('prompt', [''])[0] or EXAMPLES[0]
            choice = data.get('choice', [''])[0]
            new_adj = data.get('new_adj', [''])[0]
            steps = int(data.get('steps', ['10'])[0])
            random_seed = 'random_seed' in data
            try:
                prompt, results = generate(prompt, choice, new_adj, steps,
                                           random_seed)
            except Exception as e:  # surface errors in the page
                results = f'<pre>error: {e}</pre>'
            self._send(render(prompt=prompt, new_adj=new_adj, steps=steps,
                              random_seed=random_seed, results=results))

    Handler.generate = staticmethod(generate)  # exposed for tests
    Handler.batcher = batcher
    return Handler


def get_args(argv=None):
    parser = argparse.ArgumentParser(prog='daam-demo')
    parser.add_argument('--model', '-m', type=str, default='v2-1-base',
                        choices=list(MODEL_ID_MAP.keys()))
    parser.add_argument('--seed', '-s', type=int, default=0)
    parser.add_argument('--port', '-p', type=int, default=8080)
    parser.add_argument('--tiny', action='store_true',
                        help='random-weight tiny fixture')
    parser.add_argument('--from-path', type=str, default=None)
    parser.add_argument('--scheduler', type=str, default='ddim')
    parser.add_argument('--gradio', action='store_true',
                        help='serve via Gradio if installed')
    parser.add_argument('--batch-size', type=int, default=1,
                        help='microbatch concurrent requests into one traced '
                             'call of this (fixed, padded) batch size')
    parser.add_argument('--dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='model compute dtype (bfloat16 for TPU serving)')
    return parser.parse_args(argv)


def main(argv=None):
    import http.server

    from ..utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    args = get_args(argv)
    from ..pipeline.sd import StableDiffusionPipeline

    import jax.numpy as jnp

    source = 'tiny' if args.tiny else (args.from_path or MODEL_ID_MAP[args.model])
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(source,
                                                   scheduler=args.scheduler,
                                                   dtype=dtype)

    if args.gradio:
        try:
            return _gradio_main(pipe, args)
        except ImportError:
            print('gradio not installed; falling back to builtin server')

    handler = make_app(pipe, args.seed, batch_size=args.batch_size)
    while True:
        try:
            server = http.server.ThreadingHTTPServer(('0.0.0.0', args.port),
                                                     handler)
            print(f'daam-demo listening on http://0.0.0.0:{args.port}')
            server.serve_forever()
        except OSError:
            time.sleep(1)
        except KeyboardInterrupt:
            break


def _gradio_main(pipe, args):  # pragma: no cover - optional dependency
    import gradio as gr
    handler = make_app(pipe, args.seed, batch_size=args.batch_size)

    def run(prompt, choice, new_adj, steps, random_seed):
        _, html = handler.generate(prompt, choice, new_adj, int(steps),
                                   random_seed)
        return html

    demo = gr.Interface(
        fn=run,
        inputs=[gr.Textbox(label='Prompt', value=EXAMPLES[0]),
                gr.Textbox(label='Adjective to replace'),
                gr.Textbox(label='New adjective'),
                gr.Slider(1, 50, value=10, step=1, label='Inference steps'),
                gr.Checkbox(label='Random seed')],
        outputs=gr.HTML(),
        title='DAAM-TPU: Attention Maps for Interpreting Stable Diffusion')
    demo.launch(server_name='0.0.0.0', server_port=args.port)


if __name__ == '__main__':
    main()
