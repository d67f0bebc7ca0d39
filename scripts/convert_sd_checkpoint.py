"""Convert a diffusers SD2.1-base checkpoint to scaledreamer_tpu Flax params.

Usage:
    python scripts/convert_sd_checkpoint.py pretrained/stable-diffusion-2-1-base

Reads `unet/diffusion_pytorch_model.{safetensors,bin}` and
`vae/diffusion_pytorch_model.{safetensors,bin}` from a diffusers-layout
directory and writes `flax_params.msgpack` next to them, matching the
parameter tree of models/diffusion/{unet,vae}.py (NHWC conv kernels, linen
Dense layout).

Mapping notes:
- torch conv weight [O, I, kh, kw]  -> flax [kh, kw, I, O]
- torch linear weight [O, I]        -> flax kernel [I, O]
- GroupNorm/LayerNorm weight/bias   -> scale/bias
- diffusers block names (down_blocks.N.resnets.M / attentions.M /
  downsamplers.0, mid_block.*, up_blocks.*) map onto the flat
  down_{i}_resnets_{j} / down_{i}_attentions_{j} / ... names used here.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def load_torch_state(dirpath: str, sub: str) -> dict:
    base = os.path.join(dirpath, sub)
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin"):
        path = os.path.join(base, name)
        if os.path.exists(path):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file
                return load_file(path)
            import torch
            sd = torch.load(path, map_location="cpu")
            return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No checkpoint under {base}")


def t2f(name: str, arr: np.ndarray):
    """torch tensor -> (is_scale, flax array) with layout transposed."""
    if arr.ndim == 4:      # conv [O, I, kh, kw] -> [kh, kw, I, O]
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2:      # linear [O, I] -> [I, O]
        return np.transpose(arr, (1, 0))
    return arr


def convert_unet_key(k: str):
    """diffusers unet key -> flax path tuple (under 'unet')."""
    parts = k.split(".")
    out = []
    if parts[0] == "conv_in":
        out = ["conv_in"]
    elif parts[0] == "time_embedding":
        out = ["time_embedding", parts[1]]
    elif parts[0] == "conv_norm_out":
        out = ["conv_norm_out"]
    elif parts[0] == "conv_out":
        out = ["conv_out"]
    elif parts[0] == "down_blocks":
        i = parts[1]
        kind = parts[2]            # resnets / attentions / downsamplers
        j = parts[3]
        if kind == "downsamplers":
            out = [f"down_{i}_downsample", *parts[4:-1]]
        elif kind == "resnets":
            out = [f"down_{i}_resnets_{j}", *parts[4:-1]]
        else:
            out = [f"down_{i}_attentions_{j}", *_attn_rest(parts[4:-1])]
    elif parts[0] == "up_blocks":
        i = parts[1]
        kind = parts[2]
        j = parts[3]
        if kind == "upsamplers":
            out = [f"up_{i}_upsample", *parts[4:-1]]
        elif kind == "resnets":
            out = [f"up_{i}_resnets_{j}", *parts[4:-1]]
        else:
            out = [f"up_{i}_attentions_{j}", *_attn_rest(parts[4:-1])]
    elif parts[0] == "mid_block":
        kind = parts[1]
        j = parts[2]
        if kind == "resnets":
            out = [f"mid_resnets_{j}", *parts[3:-1]]
        else:
            out = [f"mid_attentions_{j}" if j != "0" else "mid_attentions_0",
                   *_attn_rest(parts[3:-1])]
    else:
        return None
    leaf = parts[-1]
    leaf = {"weight": "kernel", "bias": "bias"}.get(leaf, leaf)
    return tuple(out) + (leaf,)


def _attn_rest(parts):
    """transformer sub-path: norm / proj_in / transformer_blocks.N.xxx."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "transformer_blocks":
            out.append(f"transformer_blocks_{parts[i + 1]}")
            i += 2
        elif p in ("attn1", "attn2", "ff", "norm1", "norm2", "norm3"):
            out.append(p)
            i += 1
        elif p == "net":
            # ff.net.0.proj -> net_0_proj ; ff.net.2 -> net_2
            if parts[i + 1] == "0":
                out.append("net_0_proj")
                i += 3
            else:
                out.append(f"net_{parts[i + 1]}")
                i += 2
        elif p == "to_out":
            out.append("to_out_0")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def build_flax_tree(state: dict, convert_key) -> dict:
    tree = {}
    skipped = []
    for k, v in state.items():
        path = convert_key(k)
        if path is None:
            skipped.append(k)
            continue
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = path[-1]
        arr = t2f(k, np.asarray(v))
        # norm layers use scale, not kernel
        if leaf == "kernel" and arr.ndim == 1:
            leaf = "scale"
        node[leaf] = arr
    if skipped:
        print(f"skipped {len(skipped)} keys, e.g. {skipped[:5]}")
    return tree


def convert_vae_key(k: str):
    parts = k.split(".")
    pre = []
    if parts[0] in ("encoder", "decoder"):
        side = parts[0]
        rest = parts[1:]
        if rest[0] == "conv_in":
            pre = [side, "conv_in"]
            rest = rest[1:]
        elif rest[0] == "conv_norm_out":
            pre = [side, "conv_norm_out"]
            rest = rest[1:]
        elif rest[0] == "conv_out":
            pre = [side, "conv_out"]
            rest = rest[1:]
        elif rest[0] == "down_blocks":
            i, kind, j = rest[1], rest[2], rest[3]
            if kind == "downsamplers":
                pre = [side, f"down_{i}_downsample"]
                rest = rest[5:]
            else:
                pre = [side, f"down_{i}_resnets_{j}"]
                rest = rest[4:]
        elif rest[0] == "up_blocks":
            i, kind, j = rest[1], rest[2], rest[3]
            if kind == "upsamplers":
                pre = [side, f"up_{i}_upsample"]
                rest = rest[5:]
            else:
                pre = [side, f"up_{i}_resnets_{j}"]
                rest = rest[4:]
        elif rest[0] == "mid_block":
            kind, j = rest[1], rest[2]
            if kind == "resnets":
                pre = [side, f"mid_resnets_{j}"]
            else:
                pre = [side, "mid_attention"]
            rest = rest[3:]
        else:
            return None
        leaf = rest[-1] if rest else parts[-1]
        mids = rest[:-1]
        mids = ["to_out_0" if m == "to_out" else m
                for m in mids if m != "0" or True]
        # collapse to_out.0
        clean = []
        skip_next = False
        for m in mids:
            if skip_next:
                skip_next = False
                continue
            if m == "to_out_0":
                clean.append(m)
                skip_next = True
            else:
                clean.append(m)
        leaf = {"weight": "kernel", "bias": "bias"}.get(leaf, leaf)
        return tuple(pre + clean) + (leaf,)
    if parts[0] == "quant_conv":
        return ("encoder", "quant_conv",
                {"weight": "kernel", "bias": "bias"}[parts[-1]])
    if parts[0] == "post_quant_conv":
        return ("decoder", "post_quant_conv",
                {"weight": "kernel", "bias": "bias"}[parts[-1]])
    return None


def main():
    dirpath = sys.argv[1]
    import flax.serialization as ser

    unet_state = load_torch_state(dirpath, "unet")
    vae_state = load_torch_state(dirpath, "vae")

    params = {
        "unet": build_flax_tree(unet_state, convert_unet_key),
        "vae": build_flax_tree(vae_state, convert_vae_key),
    }
    out = os.path.join(dirpath, "flax_params.msgpack")
    with open(out, "wb") as f:
        f.write(ser.to_bytes(params))
    print("wrote", out)


if __name__ == "__main__":
    main()
