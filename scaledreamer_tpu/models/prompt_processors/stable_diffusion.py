"""Concrete prompt processors: SD CLIP text encoder + dummy.

Parity targets:
- `stable-diffusion-prompt-processor`
  (reference threestudio/models/prompt_processors/stable_diffusion_prompt_processor.py:14-103)
- `dummy-prompt-processor` (dummy_prompt_processor.py:11-18).

The text encoder runs in-process on host CPU via `transformers` (no VRAM to
reclaim on TPU hosts, so the reference's spawn-subprocess dance — base.py:374-394
— is unnecessary; the `spawn` config key is accepted and ignored).

Offline mode: when the pretrained path does not exist, embeddings fall back to
deterministic pseudo-embeddings keyed by md5(prompt) so the full pipeline runs
end-to-end without weights (clearly logged). Benchmarks are unaffected: the
hot path consumes fixed-shape [77, 1024] tensors either way.
"""

from __future__ import annotations

import hashlib
import logging
import os
from dataclasses import dataclass
from typing import List

import numpy as np

from ... import register
from .base import PromptProcessor

logger = logging.getLogger(__name__)

SD21_CTX = 77
SD21_DIM = 1024


def _pseudo_embedding(prompt: str, n_ctx: int, dim: int) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.md5(prompt.encode()).digest()[:8], "little") % (2 ** 31)
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_ctx, dim)).astype(np.float32)


def encode_with_clip(model_path: str, prompts: List[str],
                     max_length: int = SD21_CTX):
    """Run the SD text encoder on CPU -> (local [N,77,C], global [N,C]).

    Equivalent to reference spawn_func
    (stable_diffusion_prompt_processor.py:33-76 and
    custom/.../stable_diffusion_multi_prompt_processor.py:40-92): local =
    last_hidden_state, global = pooled output.
    """
    import torch
    from transformers import AutoTokenizer, CLIPTextModel

    tokenizer = AutoTokenizer.from_pretrained(
        model_path, subfolder="tokenizer")
    text_encoder = CLIPTextModel.from_pretrained(
        model_path, subfolder="text_encoder", device_map="cpu")
    locals_, globals_ = [], []
    with torch.no_grad():
        for i in range(0, len(prompts), 32):
            chunk = prompts[i:i + 32]
            tokens = tokenizer(chunk, padding="max_length",
                               max_length=max_length, return_tensors="pt")
            out = text_encoder(tokens.input_ids)
            locals_.append(out[0].float().numpy())
            globals_.append(out[1].float().numpy())
    del text_encoder
    return np.concatenate(locals_), np.concatenate(globals_)


@register("stable-diffusion-prompt-processor")
class StableDiffusionPromptProcessor(PromptProcessor):
    @dataclass
    class Config(PromptProcessor.Config):
        pass

    cfg: "StableDiffusionPromptProcessor.Config"

    def encode_prompts(self, prompts: List[str]) -> np.ndarray:
        path = self.cfg.pretrained_model_name_or_path
        if os.path.isdir(path):
            local, _ = encode_with_clip(path, prompts)
            return local
        logger.warning(
            "Pretrained text encoder not found at %s; using deterministic "
            "pseudo-embeddings (offline mode).", path)
        return np.stack(
            [_pseudo_embedding(p, SD21_CTX, SD21_DIM) for p in prompts])


@register("dummy-prompt-processor")
class DummyPromptProcessor(PromptProcessor):
    """No-encoder processor for running without a text model
    (reference dummy_prompt_processor.py:11-18)."""

    @dataclass
    class Config(PromptProcessor.Config):
        prompt: str = ""
        n_ctx: int = SD21_CTX
        n_dim: int = SD21_DIM

    cfg: "DummyPromptProcessor.Config"

    def encode_prompts(self, prompts: List[str]) -> np.ndarray:
        return np.stack(
            [_pseudo_embedding(p, self.cfg.n_ctx, self.cfg.n_dim)
             for p in prompts])
