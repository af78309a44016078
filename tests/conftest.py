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
# 85x difference there.  The test harness opts in explicitly (DAAM_THP=1) —
# library code never flips the system-wide policy by default (VERDICT r4 #5);
# DAAM_NO_THP=1 still wins, and the prior mode is restored at exit.
os.environ.setdefault('DAAM_THP', '1')
from daam_tpu.utils import ensure_hugepages
ensure_hugepages()


# ---------------------------------------------------------------- test tiers
# Two CI tiers (VERDICT r3 #8): the default run is the FAST tier; the heavy
# tail (long-horizon parity / checkpoint-dir / notebook studies) is marked
# `full` and skipped unless --full is passed.  Heavier still are the
# env-gated suites (DAAM_FULL_SPATIAL / DAAM_FULL_GEOMETRY).
#
#   python -m pytest tests/ -q           # fast tier
#   python -m pytest tests/ -q --full    # everything (incl. `full` marker)
#
# Selection by marker also works: -m fast / -m full (with --full).

import pytest

# Slowest tests by measured --durations on this 1-core host; each has
# faster siblings covering the same subsystem in the fast tier.
_FULL_TIER = (
    # The real-reference-package suite costs ~55 s (the module fixture drives
    # the actual /root/reference daam package over a fabricated checkpoint);
    # the fast tier keeps reference parity via test_reference_parity.py and
    # test_e2e_fidelity_torch.py.
    'test_against_real_reference.py',
    'test_real_reference_full_geometry.py',  # real-geometry reference parity
    'test_full_geometry.py::test_unet_full_geometry_capture_parity',
    'test_full_geometry.py::test_clip_full_geometry_parity',
    'test_parallel.py::test_sdxl_dp_tp_traced_matches_single_device',
    'test_parallel.py::test_tp4_traced_matches_single_device',
    # three fresh SPMD compiles on the virtual mesh (~110 s); the dryrun +
    # sharded-equivalence tests keep multi-chip coverage in the fast tier
    'test_parallel.py::test_spmd_hlo_contains_expected_collectives',
    'test_parallel_transplant.py::test_mesh_traced_to_experiment',
    'test_heads_io.py::test_time_heat_maps_sum_to_global',
    'test_heads_io.py::test_time_maps_chunked_coarser_granularity',
    'test_pipeline_trace.py::test_scheduler_variants_run',
    # 5-head/64-dim full-pipeline ghost-head parity (~60 s; the fast tier
    # keeps the module-level Attention odd-head parity in
    # test_pallas_attention.py).
    'test_pipeline_trace.py::test_traced_generation_odd_heads_packed_matches_jnp',
    'test_models.py::test_unet_replay_changes_output',
    'test_cli.py::test_time_maps_flag_without_save_heads',
    'test_cli.py::test_time_maps_single_step_writes_gif',
    'test_cli.py::test_time_maps_flag',
    'test_cli.py::test_cconj_action',
    'test_cli_coco.py::test_batch_size_flag',
    'test_pipeline_options.py::test_callback_without_steps_still_counts',
    'test_params_io.py::test_params_load_with_dtype',
    'test_notebooks.py::test_notebook_0_setup',
    'test_checkpoint_dir.py::test_from_pretrained_dir_end_to_end',
    'test_checkpoint_dir.py::test_from_pretrained_dir_safetensors',
    'test_checkpoint_dir.py::test_from_pretrained_dir_consume_leaves_no_reference',
    'test_checkpoint_dir.py::test_from_pretrained_dir_sdxl_dual_encoder',
    'test_cli_batch_repro.py::test_regenerate_reproduces_across_batch_sizes',
    'test_e2e_fidelity_torch.py::test_e2e_sdxl_heat_map_fidelity',
    'test_cli.py::test_demo_generate_counterfactual',
    'test_cli_coco.py::test_coco_unreal_action',
    'test_cli_coco.py::test_word_lemma_filter',
    'test_cli_stdin.py::test_prompt_action',
    'test_notebooks.py::test_notebook_1_visuosyntactic_corpus_study',
    'test_notebooks.py::test_notebook_2_visuosemantic',
    'test_heads_io.py::test_save_heads_chunked_matches_single_chunk',
    'test_distributed.py::test_make_global_mesh_generates',
    # 2-OS-process transplant: four fresh traced compiles across two child
    # processes (~3 min); the fast tier keeps true-multiprocess coverage via
    # the plain-generation children in the same module.
    'test_multiprocess.py::test_multiprocess_save_load_heads_transplant',
)


def pytest_addoption(parser):
    parser.addoption('--full', action='store_true', default=False,
                     help='run the full tier (slow tests) too')


def pytest_configure(config):
    config.addinivalue_line('markers', 'full: slow tier (needs --full)')
    config.addinivalue_line('markers', 'fast: default CI tier')


def pytest_collection_modifyitems(config, items):
    run_full = config.getoption('--full')
    skip_full = pytest.mark.skip(reason='full tier: pass --full to run')
    for item in items:
        nodeid = item.nodeid.split('tests/')[-1]
        if any(nodeid.startswith(f) for f in _FULL_TIER):
            item.add_marker(pytest.mark.full)
            if not run_full:
                item.add_marker(skip_full)
        else:
            item.add_marker(pytest.mark.fast)
