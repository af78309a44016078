"""Remaining utils surface: auto_device, auto_autocast, cache_dir, plot_mask."""

import numpy as np

from daam_tpu.utils import (auto_autocast, auto_device, cache_dir,
                            plot_mask_heat_map)


def test_auto_device_returns_device():
    dev = auto_device()
    assert hasattr(dev, 'platform')


def test_auto_device_commits_array():
    import jax.numpy as jnp
    x = auto_device(jnp.ones((2, 2)))
    assert np.asarray(x).sum() == 4


def test_auto_autocast_noop_context():
    with auto_autocast(dtype='whatever', enabled=True) as ctx:
        assert ctx is not None


def test_cache_dir_is_path():
    d = cache_dir()
    assert d.name == 'daam_tpu'


def test_enable_persistent_compilation_cache_sets_live_config():
    """Must set the live jax config (the env var alone is read only at jax
    import, which happens before entry points run under site hooks)."""
    import jax
    from daam_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import os
    assert jax.config.jax_compilation_cache_dir == \
        os.environ['JAX_COMPILATION_CACHE_DIR']


def test_plot_mask_heat_map_runs():
    import matplotlib
    matplotlib.use('Agg')
    import PIL.Image
    im = PIL.Image.new('RGB', (8, 8), (100, 0, 0))
    hm = np.random.RandomState(0).rand(8, 8)
    plot_mask_heat_map(im, hm, threshold=0.5)  # should not raise


def test_ensure_hugepages_is_opt_in(monkeypatch):
    """The system-wide THP flip must never happen by default (VERDICT r4 #5):
    without DAAM_THP=1 the helper returns before touching /sys; DAAM_NO_THP=1
    wins even when opted in."""
    import builtins

    from daam_tpu import utils as U

    def _no_open(*a, **kw):
        raise AssertionError('ensure_hugepages touched the filesystem '
                             'without DAAM_THP=1')

    monkeypatch.delenv('DAAM_THP', raising=False)
    monkeypatch.delenv('DAAM_NO_THP', raising=False)
    monkeypatch.setattr(builtins, 'open', _no_open)
    U.ensure_hugepages()  # default: no /sys access at all

    monkeypatch.setenv('DAAM_THP', '1')
    monkeypatch.setenv('DAAM_NO_THP', '1')
    U.ensure_hugepages()  # explicit off still wins
