"""ObjectHooker / AggregateHooker / locator semantics (reference daam/hook.py)."""

import pytest

from daam_tpu.hook import (AggregateHooker, ObjectHooker,
                           UNetCrossAttentionLocator)
from daam_tpu.models.configs import get_pipeline_config


class Target:
    def greet(self):
        return 'original'


class GreetHooker(ObjectHooker):
    def _hook_impl(self):
        self.monkey_patch('greet', self._hooked_greet)

    def _hooked_greet(hk_self, module):
        return 'hooked+' + hk_self.monkey_super('greet')


def test_monkey_patch_and_restore():
    t = Target()
    h = GreetHooker(t)
    with h:
        assert t.greet() == 'hooked+original'
    assert t.greet() == 'original'


def test_double_hook_raises():
    h = GreetHooker(Target())
    h.hook()
    with pytest.raises(RuntimeError):
        h.hook()
    h.unhook()
    with pytest.raises(RuntimeError):
        h.unhook()


def test_monkey_patch_strict_missing_attr():
    class H(ObjectHooker):
        def _hook_impl(self):
            self.monkey_patch('nope', lambda m: None)

    with pytest.raises(AttributeError):
        H(Target()).hook()

    class HLoose(ObjectHooker):
        def _hook_impl(self):
            self.monkey_patch('nope', lambda m: None, strict=False)

    HLoose(Target()).hook()  # no raise


def test_aggregate_hooker_fans_out():
    t1, t2 = Target(), Target()
    agg = AggregateHooker([GreetHooker(t1), GreetHooker(t2)])
    with agg:
        assert t1.greet().startswith('hooked')
        assert t2.greet().startswith('hooked')
    assert t1.greet() == 'original'


def test_locator_sd21_names_and_restrict():
    cfg = get_pipeline_config('v2-1-base').unet
    loc = UNetCrossAttentionLocator()
    layers = loc.locate(cfg)
    assert len(layers) == 15  # 9 up + 6 down, mid excluded by default
    assert loc.layer_names[0] == 'up-attn-0'
    assert [i.layer_idx for i in layers] == list(range(15))

    loc_m = UNetCrossAttentionLocator(locate_middle_block=True)
    assert len(loc_m.locate(cfg)) == 16

    # restrict={0}: first attn of each up/down block (3 up + 3 down blocks)
    loc_r = UNetCrossAttentionLocator(restrict={0})
    assert len(loc_r.locate(cfg)) == 6
