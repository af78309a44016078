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

# The axon TPU plugin (registered by sitecustomize before pytest starts)
# overrides JAX_PLATFORMS; force the platform back to CPU explicitly so tests
# run on the local 8-device virtual mesh, not the remote chip.
import jax
jax.config.update('jax_platforms', 'cpu')

import matplotlib
matplotlib.use('Agg')

# Multi-GB fabrications (full-geometry parity tests) are first-touch
# page-fault-bound on hosts with a slow 4 KB fault path; THP=always is an
# 85x difference there (no-op without root, see utils.ensure_hugepages).
from daam_tpu.utils import ensure_hugepages
ensure_hugepages()
