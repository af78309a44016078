"""Generic object-hooking layer (API parity with reference ``daam/hook.py``).

In the reference, hooking rewires eager PyTorch modules at runtime
(``ObjectHooker.monkey_patch``, ``daam/hook.py:58-64``).  In the TPU rebuild
the *compute path* is functional — tracing changes which jitted function the
pipeline runs, not the model's innards — but the hooking layer survives as the
way trace contexts attach/detach to pipeline objects and as a public utility:
``ObjectHooker`` still supports reversible attribute patching of arbitrary
Python objects, ``AggregateHooker`` fans out over many hooks, and
``UNetCrossAttentionLocator`` enumerates the UNet's cross-attention layers in
the reference's order (up → down → mid, ``daam/hook.py:110-114``) from the
static model config rather than by walking live modules.
"""

import functools
import itertools
from typing import Any, Generic, List, Optional, Set, TypeVar

from .models.unet import CrossAttnLayerInfo, cross_attention_layout

__all__ = ['ObjectHooker', 'ModuleLocator', 'AggregateHooker',
           'UNetCrossAttentionLocator']

ModuleType = TypeVar('ModuleType')
ModuleListType = TypeVar('ModuleListType', bound=List)


class ModuleLocator(Generic[ModuleType]):
    def locate(self, model) -> List[ModuleType]:
        raise NotImplementedError


class ObjectHooker(Generic[ModuleType]):
    """Reversible monkey-patching with context-manager protocol
    (reference ``daam/hook.py:22-73``)."""

    def __init__(self, module: ModuleType):
        self.module: ModuleType = module
        self.hooked = False
        self.old_state = dict()

    def __enter__(self):
        self.hook()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.unhook()

    def hook(self):
        if self.hooked:
            raise RuntimeError('Already hooked module')
        self.old_state = dict()
        self.hooked = True
        self._hook_impl()
        return self

    def unhook(self):
        if not self.hooked:
            raise RuntimeError('Module is not hooked')
        for k, v in self.old_state.items():
            if k.startswith('old_fn_'):
                setattr(self.module, k[7:], v)
        self.hooked = False
        self._unhook_impl()
        return self

    def monkey_patch(self, fn_name: str, fn, strict: bool = True):
        try:
            self.old_state[f'old_fn_{fn_name}'] = getattr(self.module, fn_name)
            setattr(self.module, fn_name, functools.partial(fn, self.module))
        except AttributeError:
            if strict:
                raise

    def monkey_super(self, fn_name: str, *args, **kwargs):
        return self.old_state[f'old_fn_{fn_name}'](*args, **kwargs)

    def _hook_impl(self):
        raise NotImplementedError

    def _unhook_impl(self):
        pass


class AggregateHooker(ObjectHooker[ModuleListType]):
    """Fans hook/unhook over a list of hookers (reference ``daam/hook.py:76-86``)."""

    def _hook_impl(self):
        for h in self.module:
            h.hook()

    def _unhook_impl(self):
        for h in self.module:
            h.unhook()

    def register_hook(self, hook: ObjectHooker):
        self.module.append(hook)


class UNetCrossAttentionLocator(ModuleLocator[CrossAttnLayerInfo]):
    """Enumerate cross-attention layers in reference locator order.

    Mirrors ``daam/hook.py:89-127``: up blocks first, then down, then
    (optionally) the mid block; ``restrict`` filters by enumeration index
    (the ``low_memory`` mode keeps only index 0, reference ``daam/trace.py:35``).
    Operates on the static UNet config — the functional analog of walking
    ``unet.up_blocks``/``down_blocks`` for ``attn2`` modules.
    """

    def __init__(self, restrict: Optional[Set[int]] = None,
                 locate_middle_block: bool = False):
        self.restrict = restrict
        self.layer_names: List[str] = []
        self.locate_middle_block = locate_middle_block

    def locate(self, unet) -> List[CrossAttnLayerInfo]:
        """``unet``: a UNet config, a UNet module, or a pipeline's unet shim."""
        config = getattr(unet, 'config', unet)
        self.layer_names.clear()
        infos = cross_attention_layout(config)
        if not self.locate_middle_block:
            infos = [x for x in infos if x.position != 'mid']

        # Group by UNet block (position, level); ``restrict`` filters by index
        # *within* each block and names restart per block, exactly like the
        # reference's per-block loop (``daam/hook.py:115-123``).
        located: List[CrossAttnLayerInfo] = []
        for (_pos, _level), group in itertools.groupby(
                infos, key=lambda x: (x.position, x.level)):
            group = list(group)
            kept = [b for idx, b in enumerate(group)
                    if self.restrict is None or idx in self.restrict]
            located.extend(kept)
            self.layer_names.extend(f'{_pos}-attn-{i}' for i in range(len(kept)))

        # Global layer_idx = index in the located list (reference
        # ``daam/trace.py:50``: ``enumerate(self.locator.locate(...))``).
        return [info._replace(layer_idx=i) for i, info in enumerate(located)]
