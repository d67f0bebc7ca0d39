"""Convert an MVDream `sd-v2.1-base-4view.pt` LDM checkpoint to Flax params.

Usage:
    python scripts/convert_mvdream_checkpoint.py pretrained/sd-v2.1-base-4view.pt

The checkpoint is an LDM-layout torch state dict (reference
extern/mvdream/model_zoo.py:35-58 loads it via build_model):
- `model.diffusion_model.*`  — MultiViewUNetModel (openaimodel naming:
  time_embed.0/2, camera_embed.0/2, input_blocks.N.M, middle_block.M,
  output_blocks.N.M, out.0/2)
- `first_stage_model.*`      — AutoencoderKL (encoder.down.i.block.j,
  mid.block_1/attn_1/block_2, nin_shortcut, norm_out, quant_conv, ...)
- `cond_stage_model.*`       — frozen CLIP text encoder (not converted;
  prompt embeddings are produced by the prompt processors)

Strategy: rename LDM keys into the diffusers layout (the standard public
LDM<->diffusers mapping), then reuse the diffusers->Flax converter from
convert_sd_checkpoint.py. Output: `<ckpt>.flax_params.msgpack` with
{"unet": ..., "vae": ...} matching models/diffusion/{unet,vae}.py
(camera_embedding comes along via camera_embed.0/2 -> linear_1/2).

The SD2.1-base-4view UNet uses use_linear_in_transformer=True; 1x1-conv
proj_in/proj_out weights (SD1.x-style checkpoints) are squeezed to linear.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
from convert_sd_checkpoint import (build_flax_tree, convert_unet_key,  # noqa
                                   convert_vae_key)

# SD2.1 block structure: 4 blocks x 2 layers, attention in blocks 0-2
_N_BLOCKS = 4
_LAYERS = 2

_RES_MAP = {
    "in_layers.0": "norm1", "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2", "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _map_resnet(rest: str) -> str:
    for k, v in _RES_MAP.items():
        if rest.startswith(k):
            return v + rest[len(k):]
    raise KeyError(f"unknown resnet sub-key {rest}")


def ldm_unet_to_diffusers(k: str):
    """model.diffusion_model-relative LDM key -> diffusers UNet key."""
    if k.startswith("time_embed.0."):
        return "time_embedding.linear_1." + k.split(".")[-1]
    if k.startswith("time_embed.2."):
        return "time_embedding.linear_2." + k.split(".")[-1]
    if k.startswith("camera_embed.0."):
        return "camera_embedding.linear_1." + k.split(".")[-1]
    if k.startswith("camera_embed.2."):
        return "camera_embedding.linear_2." + k.split(".")[-1]
    if k.startswith("out.0."):
        return "conv_norm_out." + k.split(".")[-1]
    if k.startswith("out.2."):
        return "conv_out." + k.split(".")[-1]
    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.+)", k)
    if m:
        n, mod, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if n == 0:
            return "conv_in." + rest
        per = _LAYERS + 1
        i, j = (n - 1) // per, (n - 1) % per
        if j == _LAYERS:  # downsampler slot
            assert rest.startswith("op."), (k,)
            return f"down_blocks.{i}.downsamplers.0.conv." + rest[3:]
        if mod == 0:
            return f"down_blocks.{i}.resnets.{j}." + _map_resnet(rest)
        return f"down_blocks.{i}.attentions.{j}." + rest
    m = re.match(r"middle_block\.(\d+)\.(.+)", k)
    if m:
        mod, rest = int(m.group(1)), m.group(2)
        if mod == 0:
            return "mid_block.resnets.0." + _map_resnet(rest)
        if mod == 1:
            return "mid_block.attentions.0." + rest
        return "mid_block.resnets.1." + _map_resnet(rest)
    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.+)", k)
    if m:
        n, mod, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        per = _LAYERS + 1
        i, j = n // per, n % per
        if mod == 0:
            return f"up_blocks.{i}.resnets.{j}." + _map_resnet(rest)
        if rest.startswith("conv.") or rest == "conv.weight":
            # upsampler (module 1 in attention-free blocks, else 2)
            return f"up_blocks.{i}.upsamplers.0." + rest
        return f"up_blocks.{i}.attentions.{j}." + rest
    return None  # e.g. label_emb (unused by 4view), alphas buffers


_VAE_ATTN = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
             "proj_out": "to_out.0"}


def ldm_vae_to_diffusers(k: str, n_blocks: int = 4):
    """first_stage_model-relative LDM key -> diffusers AutoencoderKL key."""
    if k.startswith(("quant_conv.", "post_quant_conv.")):
        return k
    m = re.match(r"(encoder|decoder)\.(.+)", k)
    if not m:
        return None
    side, rest = m.group(1), m.group(2)

    def res_sub(r):
        return r.replace("nin_shortcut", "conv_shortcut")

    if rest.startswith("conv_in.") or rest.startswith("conv_out."):
        return f"{side}.{rest}"
    if rest.startswith("norm_out."):
        return f"{side}.conv_norm_out." + rest.split(".")[-1]
    m = re.match(r"down\.(\d+)\.block\.(\d+)\.(.+)", rest)
    if m:
        return (f"{side}.down_blocks.{m.group(1)}.resnets.{m.group(2)}."
                + res_sub(m.group(3)))
    m = re.match(r"down\.(\d+)\.downsample\.conv\.(.+)", rest)
    if m:
        return f"{side}.down_blocks.{m.group(1)}.downsamplers.0.conv.{m.group(2)}"
    m = re.match(r"up\.(\d+)\.block\.(\d+)\.(.+)", rest)
    if m:
        # LDM decoder.up is indexed low->high resolution REVERSED relative
        # to diffusers up_blocks
        i = n_blocks - 1 - int(m.group(1))
        return f"{side}.up_blocks.{i}.resnets.{m.group(2)}." + res_sub(m.group(3))
    m = re.match(r"up\.(\d+)\.upsample\.conv\.(.+)", rest)
    if m:
        i = n_blocks - 1 - int(m.group(1))
        return f"{side}.up_blocks.{i}.upsamplers.0.conv.{m.group(2)}"
    m = re.match(r"mid\.block_([12])\.(.+)", rest)
    if m:
        return (f"{side}.mid_block.resnets.{int(m.group(1)) - 1}."
                + res_sub(m.group(2)))
    m = re.match(r"mid\.attn_1\.(\w+)\.(.+)", rest)
    if m:
        return (f"{side}.mid_block.attentions.0."
                f"{_VAE_ATTN[m.group(1)]}.{m.group(2)}")
    return None


def _squeeze_1x1(state: dict) -> dict:
    """1x1-conv attention/proj weights -> linear (diffusers linear layout)."""
    out = {}
    for k, v in state.items():
        v = np.asarray(v)
        if v.ndim == 4 and v.shape[2] == v.shape[3] == 1 and (
                ".proj_in." in k or ".proj_out." in k
                or "attentions.0.to_" in k):
            v = v[:, :, 0, 0]
        out[k] = v
    return out


def convert_state_dicts(state: dict):
    """Full .pt state dict -> {"unet": flax tree, "vae": flax tree}."""
    unet_ldm = {k[len("model.diffusion_model."):]: v
                for k, v in state.items()
                if k.startswith("model.diffusion_model.")}
    vae_ldm = {k[len("first_stage_model."):]: v for k, v in state.items()
               if k.startswith("first_stage_model.")}

    unet_d = {}
    for k, v in unet_ldm.items():
        nk = ldm_unet_to_diffusers(k)
        if nk is not None:
            unet_d[nk] = np.asarray(v)
    vae_d = {}
    for k, v in vae_ldm.items():
        nk = ldm_vae_to_diffusers(k)
        if nk is not None:
            vae_d[nk] = np.asarray(v)
    unet_d = _squeeze_1x1(unet_d)
    vae_d = _squeeze_1x1(vae_d)

    def convert_unet_key_mv(k):
        # camera_embedding rides the time_embedding naming convention
        if k.startswith("camera_embedding."):
            parts = k.split(".")
            leaf = {"weight": "kernel", "bias": "bias"}[parts[-1]]
            return ("camera_embedding", parts[1], leaf)
        return convert_unet_key(k)

    return {"unet": build_flax_tree(unet_d, convert_unet_key_mv),
            "vae": build_flax_tree(vae_d, convert_vae_key)}


def main():
    import torch
    import flax.serialization as ser

    ckpt_path = sys.argv[1]
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = raw.get("state_dict", raw)
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}
    params = convert_state_dicts(state)
    out = os.path.splitext(ckpt_path)[0] + ".flax_params.msgpack"
    with open(out, "wb") as f:
        f.write(ser.to_bytes(params))
    print("wrote", out)


if __name__ == "__main__":
    main()
