"""Trace layer: ``with trace(pipe) as tc`` — capture heat maps during generation.

TPU-native counterpart of reference ``daam/trace.py``.  The public surface is
identical (``trace`` / :class:`DiffusionHeatMapHooker` with ``low_memory``,
``save_heads``, ``load_heads``, ``data_dir``; ``compute_global_heat_map``;
``to_experiment``; ``time_callback``; ``layer_names``), but the mechanism is
functional: hooking installs the trace on the pipeline object, which switches
its jitted sampling program to the capture variant.  The per-(factor, layer,
head) running sums over timesteps happen **on device inside the sampling
scan** (the analog of ``UNetCrossAttentionHooker.__call__`` →
``RawHeatMapCollection.update``, reference ``daam/trace.py:252-304``), and
arrive here as one block per spatial factor.

Differences by design (SURVEY.md §7):

* Batched prompts are supported — the reference rejects them
  (``daam/trace.py:172-173``); heat maps are kept per sample and
  ``compute_global_heat_map(batch_idx=…)`` selects one.
* ``save_heads``/``load_heads`` keep the attention replay buffer **on device**
  (bf16) in an in-process registry keyed by ``data_dir`` instead of one
  ``torch.save`` file per attention call (``daam/trace.py:246-250``);
  ``dump_heads``/``load_heads_from`` provide the on-disk form.
"""

import math
from collections import OrderedDict
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Type, Union

import numpy as np

from .experiment import GenerationExperiment
from .heatmap import GlobalHeatMap, RawHeatMapCollection
from .hook import AggregateHooker, ObjectHooker, UNetCrossAttentionLocator
from .ops.resize import bicubic_resize
from .utils import cache_dir

__all__ = ['trace', 'DiffusionHeatMapHooker', 'GlobalHeatMap', 'release_heads']


# In-process replay registry: data_dir key -> {layer_name: (steps, 2B, H, hw, T)}.
# Bounded LRU: each entry is a full replay buffer (GBs at production step
# counts), so a long-running server or a corpus run with per-experiment
# data_dirs must not accumulate them.  Oldest entries evict once the registry
# exceeds _HEAD_CACHE_MAX; evicted buffers remain loadable from their
# auto-persisted ``cache_dir()/heads/*.npz`` file.
_HEAD_CACHE_MAX = 4
_HEAD_CACHE: 'OrderedDict[str, Any]' = OrderedDict()


def _head_cache_put(key: str, value: Any):
    _HEAD_CACHE[key] = value
    _HEAD_CACHE.move_to_end(key)
    while len(_HEAD_CACHE) > _HEAD_CACHE_MAX:
        _HEAD_CACHE.popitem(last=False)


def release_heads(data_dir: Union[str, Path, None] = None) -> bool:
    """Drop an in-memory replay buffer (all of them when ``data_dir`` is
    None).  Returns whether anything was released.  The on-disk ``.npz``
    (if ``persist_heads`` wrote one) is untouched, so ``load_heads`` still
    works afterwards — this frees memory, it does not forget the heads."""
    if data_dir is None:
        released = bool(_HEAD_CACHE)
        _HEAD_CACHE.clear()
        return released
    return _HEAD_CACHE.pop(str(data_dir), None) is not None


class PipelineHooker(ObjectHooker):
    """Installs/uninstalls the trace on the pipeline object (the functional
    analog of patching ``check_inputs``/``run_safety_checker``,
    reference ``daam/trace.py:150-186``)."""

    def __init__(self, pipeline, parent_trace: 'DiffusionHeatMapHooker'):
        super().__init__(pipeline)
        self.parent_trace = parent_trace

    def _hook_impl(self):
        if getattr(self.module, '_active_trace', None) is not None:
            raise RuntimeError('Pipeline is already being traced')
        self.module._active_trace = self.parent_trace

    def _unhook_impl(self):
        self.module._active_trace = None


class DiffusionHeatMapHooker(AggregateHooker):
    def __init__(self, pipeline, low_memory: bool = False,
                 load_heads: bool = False, save_heads: bool = False,
                 data_dir: Optional[Union[str, Path]] = None,
                 persist_heads: bool = True,
                 time_chunk_steps: Optional[int] = None):
        self.all_heat_maps = RawHeatMapCollection()
        # Heat-map grid: 64² for 512/1024-px models, 96² for 768-px
        # (reference ``daam/trace.py:32-33``).
        h = pipeline.unet.config.sample_size * pipeline.vae_scale_factor
        self.latent_hw = 4096 if h == 512 or h == 1024 else 9216

        locate_middle = load_heads or save_heads
        self.locator = UNetCrossAttentionLocator(
            restrict={0} if low_memory else None,
            locate_middle_block=locate_middle)
        self.last_prompt: str = ''
        self.last_image = None
        self.last_prompts: List[str] = []
        self.last_images: List[Any] = []
        self.time_idx = 0
        self._gen_idx = 0

        self.low_memory = low_memory
        self.save_heads = save_heads
        self.load_heads = load_heads
        self.persist_heads = persist_heads
        # Per-step/per-chunk heat maps WITHOUT the full-probs replay buffer:
        # when set, the sampling scan runs in chunks of this many steps and
        # the in-kernel heat-map accumulators are snapshotted (as diffs) at
        # every chunk boundary — memory is ~the accumulator, not the
        # steps x probs buffer save_heads needs.
        self.time_chunk_steps = time_chunk_steps
        self.time_blocks: List[Dict[int, Any]] = []
        self.data_dir = str(data_dir) if data_dir is not None else 'default'

        self.pipe = pipeline
        self._located = self.locator.locate(pipeline.unet)
        self.batch_heat_maps: Dict[int, Any] = {}  # factor -> (B, L, H, T, h, w)
        self._layer_ids_by_factor: Dict[int, Tuple[int, ...]] = {}
        self._agg_cache: Dict[Any, Any] = {}  # jitted aggregation programs

        super().__init__([PipelineHooker(pipeline, self)])

    # ------------------------------------------------------------ properties
    @property
    def layer_names(self):
        return self.locator.layer_names

    @property
    def layer_heads(self):
        """Per-layer attention head counts, aligned with :attr:`layer_names`.

        The reference hardcodes 16 heads when sweeping per-head maps
        (``daam/run/generate.py:239``), silently dropping SDXL's heads 16-19;
        this exposes each located layer's real count instead."""
        return [info.heads for info in self._located]

    def time_callback(self, *args, **kwargs):
        self.time_idx += 1

    # ------------------------------------------------------- capture wiring
    def _factor_of(self, info) -> int:
        """Spatial factor of a layer: map-grid edge / layer's grid edge
        (reference ``daam/trace.py:285``: ``sqrt(latent_hw / hw)``)."""
        x = int(math.sqrt(self.latent_hw))
        latent_edge = self.pipe.config.unet.sample_size
        layer_edge = latent_edge // info.downscale
        return max(x // layer_edge, 1) if layer_edge <= x else x // layer_edge

    def capture_spec(self, pipeline) -> Tuple:
        """Static capture plan for the jitted sampler: per spatial factor,
        which layer names to accumulate and their global layer indices.
        Factor-8 (8×8) maps are skipped like the reference
        (``daam/trace.py:289``)."""
        groups: Dict[int, Tuple[List[str], List[int]]] = {}
        for info in self._located:
            factor = self._factor_of(info)
            if factor == 8:
                continue
            names, ids = groups.setdefault(factor, ([], []))
            names.append(info.name)
            ids.append(info.layer_idx)
        return tuple(sorted(
            (factor, tuple(names), tuple(ids))
            for factor, (names, ids) in groups.items()))

    def _on_call_start(self, prompt):
        self.all_heat_maps.clear()
        self.batch_heat_maps.clear()
        self.time_blocks = []
        if isinstance(prompt, str):
            self.last_prompt = prompt
            self.last_prompts = [prompt]
        else:
            self.last_prompt = prompt[0]
            self.last_prompts = list(prompt)

    def _on_call_end(self, prompts, images, accs, saved, num_steps,
                     time_blocks=None):
        import jax.numpy as jnp

        if time_blocks is not None:
            self.time_blocks = time_blocks
        self.last_prompts = list(prompts)
        self.last_images = images
        self.last_image = images[len(images) - 1] if images else None
        self._gen_idx += len(prompts) * num_steps

        spec = {factor: ids for factor, _names, ids in self.capture_spec(self.pipe)}
        for factor, block in (accs or {}).items():
            layer_ids = list(spec[factor])
            # block: (B, L, H, T, h, w); register sample 0's view in the
            # reference-shaped collection, keep the batch for batch_idx query.
            self.batch_heat_maps[factor] = block
            self._layer_ids_by_factor[factor] = tuple(layer_ids)
            self.all_heat_maps.update_block(factor, block[0], layer_ids)

        if self.save_heads and saved is not None:
            _head_cache_put(self.data_dir, saved)

    def heads_path(self) -> Path:
        """On-disk location of the auto-persisted replay buffer: one ``.npz``
        per ``data_dir`` key under ``cache_dir()/heads/`` (the cross-process
        analog of the reference's ``cache_dir()/heads/{gen_idx}.pt`` files,
        ``daam/trace.py:207-217,246-250``)."""
        import hashlib

        key = self.data_dir
        safe = ''.join(c if c.isalnum() or c in '-_.' else '_' for c in key)
        if safe != key:
            safe = f'{safe[:40]}-{hashlib.md5(key.encode()).hexdigest()[:8]}'
        return Path(cache_dir()) / 'heads' / f'{safe}.npz'

    def _persist_heads(self):
        """Write the replay buffer to :meth:`heads_path` so a later process
        (or a restarted demo server) can ``load_heads`` transparently."""
        saved = _HEAD_CACHE.get(self.data_dir)
        if saved is None:
            return
        path = self.heads_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        self.dump_heads(path, compress=False)

    def _unhook_impl(self):
        super()._unhook_impl()
        if self.save_heads and self.persist_heads:
            self._persist_heads()

    def replay_buffer(self, num_steps: int):
        """The saved raw attention for ``load_heads``
        (analog of ``daam/trace.py:249-250,281-282``).  Falls back to the
        auto-persisted ``cache_dir()/heads`` file when the in-process registry
        is cold (e.g. after a process restart).  When ``num_steps > 0``, the
        saved buffer must cover at least that many sampling steps — a clear
        error replaces the opaque scan shape failure a short buffer would hit
        (the reference fails loudly per step too: file-not-found at
        ``daam/trace.py:249-250``)."""
        if self.data_dir not in _HEAD_CACHE:
            path = self.heads_path()
            if path.exists():
                self.load_heads_from(path)
        if self.data_dir not in _HEAD_CACHE:
            raise RuntimeError(
                f'No saved attention heads under data_dir={self.data_dir!r}; '
                f'run a generation with save_heads=True first.')
        _HEAD_CACHE.move_to_end(self.data_dir)
        saved = _HEAD_CACHE[self.data_dir]
        if num_steps:
            saved_steps = min(a.shape[0] for a in saved.values())
            if saved_steps < num_steps:
                raise RuntimeError(
                    f'Replay buffer under data_dir={self.data_dir!r} covers '
                    f'{saved_steps} sampling steps but this generation needs '
                    f'{num_steps}; regenerate with save_heads=True at '
                    f'num_inference_steps>={num_steps} (or lower this run\'s '
                    f'step count).')
        return saved

    def dump_heads(self, path: Union[str, Path], compress: bool = True):
        """Persist the replay buffer to disk (.npz), the cross-process analog
        of the reference's per-call ``torch.save`` files.  bf16 buffers (the
        default ``pipe.heads_dtype``) store as fp16; fp32 buffers (exact
        reference-precision transplants) store as fp32.  ``compress=False``
        trades ~2x file size for skipping the zlib pass (what the automatic
        trace-exit persist uses — a corpus run with ``save_heads`` writes
        once per generation)."""
        saved = self.replay_buffer(0)
        arrays = {}
        from .parallel.mesh import fetch_global
        for name, arr in saved.items():
            arr = fetch_global(arr)
            arrays[name] = arr if arr.dtype == np.float32 \
                else arr.astype(np.float16)
        (np.savez_compressed if compress else np.savez)(path, **arrays)

    def load_heads_from(self, path: Union[str, Path]):
        import jax.numpy as jnp

        data = np.load(path)
        _head_cache_put(self.data_dir, {
            name: jnp.asarray(
                data[name],
                dtype=(jnp.float32 if data[name].dtype == np.float32
                       else jnp.bfloat16))
            for name in data.files})

    # ------------------------------------------------------------- queries
    def to_experiment(self, path, seed=None, id='.', subtype='.',
                      **compute_kwargs) -> GenerationExperiment:
        """Export the last generation as a serializable experiment
        (reference ``daam/trace.py:68-81``).  ``batch_idx`` (forwarded to
        :meth:`compute_global_heat_map`) selects a sample from a batched
        generation."""
        batch_idx = compute_kwargs.get('batch_idx', 0)
        image = (self.last_images[batch_idx]
                 if batch_idx < len(self.last_images) else self.last_image)
        prompt = (self.last_prompts[batch_idx]
                  if batch_idx < len(self.last_prompts) else self.last_prompt)
        return GenerationExperiment(
            image,
            np.asarray(self.compute_global_heat_map(**compute_kwargs).heat_maps),
            prompt,
            seed=seed,
            id=id,
            subtype=subtype,
            path=path,
            tokenizer=self.pipe.tokenizer,
        )

    def _aggregate_source(self, source, batch_idx, factors, head_idx,
                          layer_idx):
        """Aggregate per-factor blocks {factor: (B, L, H, T, h, w)} into a
        (T, x, x) map: filter by factor/head/layer, bicubic-upsample with
        undershoot clamp, mean over entries (reference
        ``daam/trace.py:112-126``).  Shared between the trajectory-sum path
        and the per-chunk time-map path."""
        import jax.numpy as jnp

        x = int(math.sqrt(self.latent_hw))
        if not source:
            if head_idx is not None or layer_idx is not None:
                raise RuntimeError('No heat maps found for the given parameters.')
            raise RuntimeError('No heat maps found. Did you forget to call '
                               '`with trace(...)` during generation?')

        # Static selection plan (factor -> (local layer slice, head slice));
        # the actual math runs as one jitted program (eager per-op dispatch is
        # expensive over a remote-TPU link).
        plan = []
        for factor in sorted(source):
            if factors is not None and factor not in factors:
                continue
            layer_ids = self._layer_ids_by_factor[factor]
            block_shape = source[factor].shape
            l_sel = None
            if layer_idx is not None:
                if layer_idx not in layer_ids:
                    continue
                l_sel = layer_ids.index(layer_idx)
            if head_idx is not None and head_idx >= block_shape[2]:
                continue
            plan.append((factor, l_sel))

        if not plan:
            if head_idx is not None or layer_idx is not None:
                raise RuntimeError('No heat maps found for the given parameters.')
            raise RuntimeError('No heat maps found. Did you forget to call '
                               '`with trace(...)` during generation?')

        shapes_key = tuple((f, source[f].shape, str(source[f].dtype))
                           for f, _ in plan)
        agg_key = (shapes_key, tuple(plan), head_idx, x)
        if agg_key not in self._agg_cache:
            import jax

            plan_static = tuple(plan)
            h_idx = head_idx

            def aggregate(blocks, batch_i):
                total = 0.0
                count = 0
                for factor, l_sel in plan_static:
                    sel = blocks[factor][batch_i]  # (L, H, T, h, w)
                    if l_sel is not None:
                        sel = sel[l_sel:l_sel + 1]
                    if h_idx is not None:
                        sel = sel[:, h_idx:h_idx + 1]
                    up = bicubic_resize(sel.astype(jnp.float32), (x, x),
                                        clamp_min=0.0)
                    total = total + up.sum(axis=(0, 1))
                    count += sel.shape[0] * sel.shape[1]
                return total / count  # (T, x, x)

            self._agg_cache[agg_key] = jax.jit(aggregate)

        out = self._agg_cache[agg_key](
            {f: source[f] for f, _ in plan}, batch_idx)
        if not getattr(out, 'is_fully_addressable', True):
            # multi-process runtime: the accumulators shard with the batch,
            # so the aggregated map may live partly on other hosts — gather
            # it so every process can query every sample (the one collective
            # the capture path adds when scaled out; parallel/mesh.py).
            from .parallel.mesh import fetch_global
            out = jnp.asarray(fetch_global(out))
        return out

    def compute_global_heat_map(self, prompt: Optional[str] = None,
                                factors=None, head_idx: Optional[int] = None,
                                layer_idx: Optional[int] = None,
                                normalize: bool = False,
                                batch_idx: int = 0) -> GlobalHeatMap:
        """Aggregate captured maps into a (tokens, x, x) global heat map.

        Mirrors reference ``daam/trace.py:83-132``: filter by factor /
        head / layer, bicubic-upsample each map to the x×x grid with
        undershoot clamping, mean over all (factor, layer, head) entries,
        truncate to ``len(tokenize(prompt)) + 2``, optionally normalize over
        real tokens.
        """
        import jax.numpy as jnp

        if prompt is None:
            prompt = (self.last_prompts[batch_idx]
                      if batch_idx < len(self.last_prompts) else self.last_prompt)
        # ``None`` means every captured factor.  (The reference defaults to the
        # hardcoded set {0,1,2,4,8,16,32,64}, ``daam/trace.py:103-104``, which
        # covers everything its real models produce; "all" preserves that
        # behavior while also working for nonstandard latent sizes.)
        if factors is not None:
            factors = set(factors)

        maps = self._aggregate_source(self.batch_heat_maps, batch_idx,
                                      factors, head_idx, layer_idx)
        n_tokens = len(self.pipe.tokenizer.tokenize(prompt))
        maps = maps[:n_tokens + 2]  # +1 SOS, +1 padding (ref trace.py:127)

        if normalize:
            # over real tokens only, after truncation (ref trace.py:129-130)
            maps = maps / (maps[1:-1].sum(0, keepdims=True) + 1e-6)

        return GlobalHeatMap(self.pipe.tokenizer, prompt, maps)

    def compute_time_global_heat_maps(self, prompt: Optional[str] = None,
                                      factors=None,
                                      head_idx: Optional[int] = None,
                                      layer_idx: Optional[int] = None,
                                      normalize: bool = False,
                                      batch_idx: int = 0
                                      ) -> List[GlobalHeatMap]:
        """Per-denoising-step global heat maps (requires ``save_heads=True``).

        Returns one :class:`GlobalHeatMap` per sampling step (or per
        ``time_chunk_steps``-sized chunk), each aggregated exactly like
        :meth:`compute_global_heat_map` but over a single step's attention
        instead of the trajectory sum — word-level attention *evolution*
        across the diffusion process.  Beyond the reference: its
        ``RawHeatMapCollection`` only keeps the across-step sum
        (``daam/heatmap.py:153-156``), and while its saved head files
        (``daam/trace.py:246-250``) retain per-call tensors, no API slices
        them by step.

        Two sources, picked automatically:

        * ``save_heads=True`` — exact per-step maps from the replay buffer
          (also works after ``load_heads_from``/restart), at steps x probs
          memory.
        * ``time_chunk_steps=K`` — the in-kernel accumulators are
          snapshotted every K steps during the scan; per-chunk maps cost
          only accumulator-sized diffs (the cheap path; ``K=1`` gives
          per-step maps without ever materializing the probability tensors).
        """
        import jax.numpy as jnp

        if self.time_blocks and not (self.save_heads or self.load_heads):
            return self._time_maps_from_blocks(prompt, factors, head_idx,
                                               layer_idx, normalize,
                                               batch_idx)
        try:
            saved = self.replay_buffer(0)
        except RuntimeError as e:
            raise RuntimeError(
                f'{e} (Per-step maps need either save_heads=True or the '
                f'cheap accumulator-snapshot mode: '
                f'trace(pipe, time_chunk_steps=1).)') from None
        if prompt is None:
            prompt = (self.last_prompts[batch_idx]
                      if batch_idx < len(self.last_prompts)
                      else self.last_prompt)
        if factors is not None:
            factors = set(factors)
        x = int(math.sqrt(self.latent_hw))

        total = None
        count = 0
        for factor, names, ids in self.capture_spec(self.pipe):
            if factors is not None and factor not in factors:
                continue
            pairs = list(zip(names, ids))
            if layer_idx is not None:
                pairs = [(nm, i) for nm, i in pairs if i == layer_idx]
            for nm, _i in pairs:
                a = saved[nm]                       # (S, 2B, H, hw, T)
                s_steps, two_b, n_heads, hw, _t = a.shape
                if head_idx is not None and head_idx >= n_heads:
                    continue                        # mirrors the sum path
                h = math.isqrt(hw)
                if h * h != hw:
                    raise RuntimeError(
                        'per-step heat maps require square latents '
                        f'(layer {nm}: hw={hw})')
                cond = a[:, two_b // 2 + batch_idx]  # CFG conditional half
                if head_idx is not None:
                    cond = cond[:, head_idx:head_idx + 1]
                # (S, H', hw, T) -> (S, H', T, h, w) -> upsample -> sum heads
                m = cond.astype(jnp.float32).transpose(0, 1, 3, 2)
                m = m.reshape(s_steps, m.shape[1], -1, h, h)
                up = bicubic_resize(m, (x, x), clamp_min=0.0)
                contrib = up.sum(axis=1)            # (S, T, x, x)
                total = contrib if total is None else total + contrib
                count += m.shape[1]
        if total is None or count == 0:
            raise RuntimeError('No heat maps found for the given parameters.')

        maps = total / count
        n_tokens = len(self.pipe.tokenizer.tokenize(prompt))
        maps = maps[:, :n_tokens + 2]
        if normalize:
            maps = maps / (maps[:, 1:-1].sum(1, keepdims=True) + 1e-6)
        maps = np.asarray(maps)
        return [GlobalHeatMap(self.pipe.tokenizer, prompt, maps[s])
                for s in range(maps.shape[0])]

    def _time_maps_from_blocks(self, prompt, factors, head_idx, layer_idx,
                               normalize, batch_idx) -> List[GlobalHeatMap]:
        """Per-chunk maps from the accumulator snapshots
        (``time_chunk_steps``): each chunk's diff block aggregates through
        the same plan/jit as :meth:`compute_global_heat_map`, so the chunk
        maps sum (scaled) to the trajectory map by construction."""
        if prompt is None:
            prompt = (self.last_prompts[batch_idx]
                      if batch_idx < len(self.last_prompts)
                      else self.last_prompt)
        if factors is not None:
            factors = set(factors)
        n_tokens = len(self.pipe.tokenizer.tokenize(prompt))

        results = []
        for blk in self.time_blocks:
            maps = self._aggregate_source(blk, batch_idx, factors, head_idx,
                                          layer_idx)
            maps = maps[:n_tokens + 2]
            if normalize:
                maps = maps / (maps[1:-1].sum(0, keepdims=True) + 1e-6)
            results.append(GlobalHeatMap(self.pipe.tokenizer, prompt,
                                         np.asarray(maps)))
        return results


trace: Type[DiffusionHeatMapHooker] = DiffusionHeatMapHooker
