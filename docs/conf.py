# Sphinx configuration for daam-tpu API docs (autodoc + napoleon, matching
# the reference's documentation setup).

import os
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'daam-tpu'
author = 'daam-tpu contributors'
copyright = '2026, daam-tpu contributors'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
    'sphinx.ext.intersphinx',
]

autodoc_member_order = 'bysource'
autodoc_typehints = 'description'
autodoc_mock_imports = ['jax', 'flax', 'matplotlib', 'scipy', 'PIL']

html_theme = 'alabaster'
exclude_patterns = ['_build']
