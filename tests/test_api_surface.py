"""API-surface parity with the reference package.

The reference's public API is the union of each module's ``__all__``
(``daam/__init__.py:1-6``; ``trace.py:19``, ``heatmap.py:17``, ``hook.py:10``,
``utils.py:16``, ``experiment.py:15``, ``evaluate.py:11``).  Every name a
reference user can import from ``daam`` must be importable from ``daam_tpu``.
This test reads the reference's ``__all__`` lists from source so new names
added upstream fail loudly here rather than silently going missing.
"""

import pathlib
import re

import pytest

import daam_tpu

REFERENCE = pathlib.Path('/root/reference/daam')

# Modules star-imported by the reference package root.  evaluate is not
# star-exported by the reference root but is a documented import path
# (``from daam.evaluate import ...``) that we also surface at top level.
STAR_MODULES = ('hook', 'trace', 'heatmap', 'utils', 'experiment')


def _reference_all(mod: str):
    src = (REFERENCE / f'{mod}.py').read_text()
    m = re.search(r'__all__\s*=\s*\[(.*?)\]', src, re.S)
    assert m, f'reference {mod}.py has no __all__'
    return re.findall(r"'([^']+)'", m.group(1))


@pytest.mark.skipif(not REFERENCE.exists(), reason='reference checkout absent')
@pytest.mark.parametrize('mod', STAR_MODULES + ('evaluate',))
def test_reference_public_names_exist(mod):
    missing = [n for n in _reference_all(mod) if not hasattr(daam_tpu, n)]
    assert not missing, f'daam_tpu lacks reference {mod} exports: {missing}'


def test_version_attribute():
    # daam/_version.py:1 + daam/__init__.py re-export
    assert isinstance(daam_tpu.__version__, str)
    assert daam_tpu.__version__.count('.') >= 1


def test_trace_alias_is_hooker_class():
    # Reference: ``trace = DiffusionHeatMapHooker`` (daam/trace.py:318)
    assert daam_tpu.trace is daam_tpu.DiffusionHeatMapHooker
