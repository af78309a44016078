"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the TPU-world technique for testing multi-chip sharding without a pod:
``--xla_force_host_platform_device_count=8`` fakes 8 devices on CPU (see
SURVEY.md §4).  Must run before anything imports jax.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import matplotlib
matplotlib.use('Agg')
