"""Build the API documentation as static HTML (docs/_build/html).

The reference ships pre-built Sphinx HTML (``docs/`` on GitHub pages,
reference ``docs/conf.py:35``).  Sphinx is not installable in this offline
image, so this is a small stdlib autodoc: it imports every ``daam_tpu``
module, introspects public classes/functions, and renders their signatures
and docstrings to one HTML page per module plus an index.  ``docs/conf.py``
remains the Sphinx config for environments that have it.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/build_docs.py
"""

import html
import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

# run from anywhere: the package root must be importable
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODULES = [
    'daam_tpu',
    'daam_tpu.trace',
    'daam_tpu.heatmap',
    'daam_tpu.hook',
    'daam_tpu.utils',
    'daam_tpu.nlp',
    'daam_tpu.tokenization',
    'daam_tpu.experiment',
    'daam_tpu.evaluate',
    'daam_tpu.coco',
    'daam_tpu.profiling',
    'daam_tpu.ops.attention',
    'daam_tpu.ops.pallas_attention',
    'daam_tpu.ops.resize',
    'daam_tpu.models.unet',
    'daam_tpu.models.clip',
    'daam_tpu.models.vae',
    'daam_tpu.models.configs',
    'daam_tpu.models.weights',
    'daam_tpu.pipeline.sd',
    'daam_tpu.pipeline.sdxl',
    'daam_tpu.pipeline.schedulers',
    'daam_tpu.parallel.mesh',
    'daam_tpu.parallel.distributed',
    'daam_tpu.parallel.analysis',
    'daam_tpu.native.bpe_binding',
    'daam_tpu.run.generate',
    'daam_tpu.run.evaluate',
    'daam_tpu.run.demo',
]

STYLE = """
body { font-family: Georgia, serif; max-width: 900px; margin: 2em auto;
       color: #222; line-height: 1.45; padding: 0 1em; }
code, pre { font-family: Menlo, monospace; font-size: 0.92em;
            background: #f6f6f4; }
pre { padding: 10px 14px; overflow-x: auto; border-left: 3px solid #cbd; }
h1 { border-bottom: 2px solid #cbd; padding-bottom: 6px; }
h2 { color: #445; margin-top: 1.6em; }
.sig { background: #eef; padding: 6px 10px; display: block;
       border-radius: 4px; margin-bottom: 4px; }
.kind { color: #778; font-size: 0.8em; text-transform: uppercase;
        letter-spacing: 0.08em; }
nav a { margin-right: 1em; }
.doc { white-space: pre-wrap; margin: 0.4em 0 1.2em 1.2em; }
"""


def _doc(obj) -> str:
    return html.escape(inspect.getdoc(obj) or '')


def _sig(obj) -> str:
    try:
        return html.escape(str(inspect.signature(obj)))
    except (ValueError, TypeError):
        return '(…)'


def render_module(name: str) -> str:
    mod = importlib.import_module(name)
    parts = [f'<html><head><meta charset="utf-8"><title>{name}</title>'
             f'<style>{STYLE}</style></head><body>'
             f'<nav><a href="index.html">← index</a></nav>'
             f'<h1><code>{name}</code></h1>'
             f'<div class="doc">{_doc(mod)}</div>']

    public = getattr(mod, '__all__', None)
    members = inspect.getmembers(mod)
    for attr, obj in members:
        if attr.startswith('_'):
            continue
        if public is not None and attr not in public:
            continue
        if inspect.ismodule(obj):
            continue
        defined_here = getattr(obj, '__module__', name) == name
        if public is None and not defined_here:
            continue
        if inspect.isclass(obj):
            parts.append(f'<h2 id="{attr}"><span class="kind">class</span> '
                         f'<code>{attr}{_sig(obj)}</code></h2>'
                         f'<div class="doc">{_doc(obj)}</div>')
            for m_name, m in inspect.getmembers(obj):
                if m_name.startswith('_'):
                    continue
                if isinstance(m, property):
                    parts.append(
                        f'<code class="sig">{attr}.{m_name}</code> '
                        f'<span class="kind">property</span>'
                        f'<div class="doc">{_doc(m.fget) if m.fget else ""}'
                        f'</div>')
                    continue
                if not (inspect.isfunction(m) or inspect.ismethod(m)):
                    continue
                parts.append(
                    f'<code class="sig">{attr}.{m_name}{_sig(m)}</code>'
                    f'<div class="doc">{_doc(m)}</div>')
        elif callable(obj):
            parts.append(f'<h2 id="{attr}"><span class="kind">function</span>'
                         f' <code>{attr}{_sig(obj)}</code></h2>'
                         f'<div class="doc">{_doc(obj)}</div>')
    parts.append('</body></html>')
    return '\n'.join(parts)


def main():
    out = Path(__file__).resolve().parent.parent / 'docs' / '_build' / 'html'
    out.mkdir(parents=True, exist_ok=True)

    index = [f'<html><head><meta charset="utf-8"><title>daam-tpu API</title>'
             f'<style>{STYLE}</style></head><body>'
             '<h1>daam-tpu API documentation</h1>'
             '<p>TPU-native rebuild of DAAM (castorini/daam): diffusion '
             'attentive attribution maps captured inside jit-compiled '
             'JAX/Flax Stable Diffusion with Pallas attention kernels.</p>'
             '<ul>']
    failed = []
    for name in MODULES:
        try:
            html_text = render_module(name)
        except Exception as e:  # pragma: no cover - build-time report
            failed.append((name, repr(e)))
            continue
        fn = name.replace('.', '_') + '.html'
        (out / fn).write_text(html_text)
        index.append(f'<li><a href="{fn}"><code>{name}</code></a></li>')
    index.append('</ul></body></html>')
    (out / 'index.html').write_text('\n'.join(index))
    print(f'wrote {len(MODULES) - len(failed)} module pages to {out}')
    for name, err in failed:
        print(f'FAILED {name}: {err}', file=sys.stderr)
    return 1 if failed else 0


if __name__ == '__main__':
    sys.exit(main())
