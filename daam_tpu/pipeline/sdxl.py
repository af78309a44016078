"""SDXL pipeline: dual text encoders + text_time micro-conditioning.

Extends the SD pipeline with SDXL's specifics (the reference supports SDXL via
``StableDiffusionXLPipeline`` and an extra image-postprocess hook, reference
``daam/trace.py:55-56,135-147``; model entry ``daam/run/generate.py:29,197-203``):
the prompt is encoded by both CLIP-L and OpenCLIP-bigG (penultimate hidden
states, concatenated to a 2048-dim context), the bigG pooled embedding plus six
size/crop time ids feed the UNet's ``text_time`` additional embedding.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..models.clip import CLIPTextEncoder
from ..models.configs import PipelineConfig
from ..tokenization import default_tokenizer
from .sd import StableDiffusionPipeline

__all__ = ['StableDiffusionXLPipeline']


class StableDiffusionXLPipeline(StableDiffusionPipeline):
    is_sdxl = True

    def __init__(self, config: PipelineConfig, params: Dict[str, Any],
                 tokenizer=None, tokenizer_2=None, scheduler='ddim',
                 dtype=jnp.float32):
        super().__init__(config, params, tokenizer=tokenizer,
                         scheduler=scheduler, dtype=dtype)
        assert config.text_2 is not None, 'SDXL requires a second text encoder config'
        # OpenCLIP pads with id 0 rather than <|endoftext|>.
        self.tokenizer_2 = tokenizer_2 or default_tokenizer(pad_id=0)
        self.text_encoder_2 = CLIPTextEncoder(config.text_2, dtype=dtype)

    def _encode_tokens(self, prompts):
        """(B, 2, 77): per-encoder ids (the two CLIP tokenizers differ in
        padding — CLIP-L pads with <|endoftext|>, OpenCLIP with 0)."""
        import numpy as np

        ids_1 = self.tokenizer(list(prompts), padding='max_length',
                               truncation=True, return_tensors='np')['input_ids']
        ids_2 = self.tokenizer_2(list(prompts), padding='max_length',
                                 truncation=True, return_tensors='np')['input_ids']
        return np.stack([ids_1, ids_2], axis=1).astype(np.int32)

    def _text_forward(self, params, input_ids):
        ids_1, ids_2 = input_ids[:, 0], input_ids[:, 1]
        hidden_1, _ = self.text_encoder.apply(
            {'params': params['text_encoder']}, ids_1, penultimate=True)
        hidden_2, pooled_2 = self.text_encoder_2.apply(
            {'params': params['text_encoder_2']}, ids_2, penultimate=True)
        context = jnp.concatenate([hidden_1, hidden_2], axis=-1)
        return context, pooled_2

    def _merge_added(self, added_uncond, added_cond, height, width):
        # added_* are the pooled bigG embeddings for each CFG half.
        pooled = jnp.concatenate([added_uncond, added_cond], axis=0)
        B2 = pooled.shape[0]
        time_ids = jnp.asarray(
            [height, width, 0, 0, height, width], dtype=jnp.float32)
        time_ids = jnp.broadcast_to(time_ids[None, :], (B2, 6))
        return {'text_embeds': pooled, 'time_ids': time_ids}
