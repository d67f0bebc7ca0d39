"""Attention dispatch: Pallas TPU flash attention with XLA fallback.

Replaces the reference's xformers `memory_efficient_attention`
(SURVEY.md §2.3 N6). The naive einsum materializes [B, H, L, L] logits —
1.5 GB for the SD UNet's 64x64 self-attention at batch 5 — which blows the
16 GB v5e HBM; the flash kernel streams K/V blocks through VMEM instead.

Dispatch policy: use the Pallas kernel when SDTPU_FLASH != "0", the
sequence lengths are block-aligned, and there is no cross-attention length
mismatch that the kernel cannot tile (kv_len must be a lane multiple).
Everything else (CPU tests, 77-token cross-attention) takes the einsum
path, whose logits are small.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import jax
import jax.numpy as jnp


@lru_cache(maxsize=1)
def _flash_enabled() -> bool:
    env = os.environ.get("SDTPU_FLASH")
    if env is not None:
        return env != "0"
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _flash_ok(q_len: int, kv_len: int, head_dim: int) -> bool:
    return (q_len % 128 == 0 and kv_len % 128 == 0 and head_dim <= 256
            and q_len >= 128 and kv_len >= 128)


def multi_head_attention(q, k, v, scale: float | None = None):
    """q [B, H, L, D], k/v [B, H, S, D] -> [B, H, L, D]."""
    B, H, L, D = q.shape
    S = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if _flash_enabled() and _flash_ok(L, S, D):
        from jax.experimental.pallas.ops.tpu.flash_attention import \
            flash_attention
        return flash_attention(q, k, v, sm_scale=scale)
    attn = jnp.einsum("bhld,bhsd->bhls", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bhsd->bhld", attn, v)
