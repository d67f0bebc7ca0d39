"""CLIP similarity + R-precision evaluator for amortized renders.

Parity target: reference `evaluation/CLIP/evaluation_amortized.py:45-157`:
- walks `--result_dir` for per-prompt subdirectories of rendered frames
  (underscores in dir names map back to spaces in prompts),
- CLIP ViT-L/14 projected text/image features, cosine similarity per frame,
- R-precision = recall@1 of each frame's image feature against the FULL
  prompt set (softmax over 100*cosine),
- writes similarity.txt / recall.txt with per-prompt and average rows.

Runs on host CPU via transformers (no TPU needed; metric-only path).
Offline mode: if the CLIP checkpoint can't be loaded, exits with an error —
metrics require real CLIP weights (there is no meaningful offline fallback).

Usage:
    python evaluation/CLIP/evaluation_amortized.py --result_dir save/itN-test
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_and_preprocess(path: str, size: int = 224) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    # resize shorter side + center crop (CLIP preprocessing)
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)  # CHW


def compute_metrics(text_features: np.ndarray,
                    image_features_by_prompt: dict):
    """Metric core (reference evaluation_amortized.py:63-114), weights-free
    and unit-testable: text_features [P, D] L2-normalized; dict maps prompt
    index -> [N_i, D] L2-normalized frame features. Returns
    (similarity_per_prompt, recall_per_prompt): cosine similarity to the
    prompt's own text feature, and recall@1 of softmax(100 * feats @ T^T)
    over the FULL prompt set."""
    sims, recalls = {}, {}
    for idx, feats in image_features_by_prompt.items():
        sim = feats @ text_features[idx]
        logits = 100.0 * feats @ text_features.T
        logits = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(logits)
        probs = probs / probs.sum(axis=-1, keepdims=True)
        correct = probs.argmax(axis=-1) == idx
        sims[idx] = float(np.mean(sim))
        recalls[idx] = float(np.mean(correct))
    return sims, recalls


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_dir", type=str, required=True)
    parser.add_argument("--num_images", type=int, default=100)
    parser.add_argument("--device", type=str, default="cpu")
    parser.add_argument("--batch_size", type=int, default=120)
    parser.add_argument("--model", type=str,
                        default="openai/clip-vit-large-patch14")
    parser.add_argument(
        "--random_init", action="store_true",
        help="PLUMBING VALIDATION ONLY: random-initialized tiny CLIP + "
             "hash tokenization, no downloads. Exercises the full "
             "pipeline (walk dirs, preprocess, encode, metrics, output "
             "files); the metric VALUES are meaningless.")
    args = parser.parse_args()

    import torch
    from transformers import (CLIPTextModelWithProjection, CLIPTokenizer,
                              CLIPVisionModelWithProjection)

    prompts = sorted(
        p for p in os.listdir(args.result_dir)
        if os.path.isdir(os.path.join(args.result_dir, p)))
    if not prompts:
        print(f"No prompt subdirectories under {args.result_dir}")
        return 1
    prompt_texts = [p.replace("_", " ") for p in prompts]

    if args.random_init:
        from transformers import CLIPTextConfig, CLIPVisionConfig
        torch.manual_seed(0)
        text_encoder = CLIPTextModelWithProjection(CLIPTextConfig(
            hidden_size=64, intermediate_size=128, projection_dim=32,
            num_hidden_layers=2, num_attention_heads=4)).eval()
        image_encoder = CLIPVisionModelWithProjection(CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, projection_dim=32,
            num_hidden_layers=2, num_attention_heads=4,
            image_size=224, patch_size=32)).eval()
        # deterministic hash tokenization (no vocab files offline);
        # crc32, NOT builtin hash() — the latter is salted per process
        # (PYTHONHASHSEED) and would change token ids between runs
        import zlib
        vocab = text_encoder.config.vocab_size
        max_len = text_encoder.config.max_position_embeddings
        rows = []
        for t in prompt_texts:
            ids = [zlib.crc32(w.encode("utf-8")) % (vocab - 2) + 1
                   for w in t.split()][:max_len]
            rows.append(ids + [0] * (max_len - len(ids)))
        tokens = torch.tensor(rows, dtype=torch.long)
    else:
        try:
            tokenizer = CLIPTokenizer.from_pretrained(args.model)
            text_encoder = CLIPTextModelWithProjection.from_pretrained(
                args.model).to(args.device).eval()
            image_encoder = CLIPVisionModelWithProjection.from_pretrained(
                args.model).to(args.device).eval()
        except Exception as e:
            print(f"ERROR: could not load CLIP weights ({e}). The evaluator "
                  "needs a local or cached copy of "
                  f"{args.model}.", file=sys.stderr)
            return 2

        tokens = tokenizer(prompt_texts, padding="max_length",
                           max_length=tokenizer.model_max_length,
                           return_tensors="pt").input_ids.to(args.device)
    with torch.no_grad():
        text_features = []
        for i in range(0, len(tokens), args.batch_size):
            text_features.append(text_encoder(
                tokens[i:i + args.batch_size])[0])
        text_features = torch.cat(text_features)
        text_features = text_features / text_features.norm(
            p=2, dim=-1, keepdim=True)

    feats_by_prompt = {}
    for idx, prompt in enumerate(prompts):
        sub = os.path.join(args.result_dir, prompt)
        frames = sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.lower().endswith(IMAGE_EXTS))[: args.num_images]
        if not frames:
            continue
        chunks = []
        for i in range(0, len(frames), args.batch_size):
            batch = np.stack([load_and_preprocess(f)
                              for f in frames[i:i + args.batch_size]])
            with torch.no_grad():
                feats = image_encoder(
                    torch.from_numpy(batch).to(args.device))[0]
                feats = feats / feats.norm(p=2, dim=-1, keepdim=True)
            chunks.append(feats.cpu().numpy())
        feats_by_prompt[idx] = np.concatenate(chunks)

    sims_i, recalls_i = compute_metrics(
        text_features.cpu().numpy(), feats_by_prompt)
    similarity_dict = {prompts[i]: v for i, v in sims_i.items()}
    recall_dict = {prompts[i]: v for i, v in recalls_i.items()}

    similarity = float(np.mean(list(similarity_dict.values())))
    recall = float(np.mean(list(recall_dict.values())))

    with open(os.path.join(args.result_dir, "similarity.txt"), "w") as f:
        for p, v in similarity_dict.items():
            f.write(f"{p}: {v}\n")
        f.write(f"avgerage: {similarity}\n")  # keep reference's key spelling
    with open(os.path.join(args.result_dir, "recall.txt"), "w") as f:
        for p, v in recall_dict.items():
            f.write(f"{p}: {v}\n")
        f.write(f"avgerage: {recall}\n")

    print(f"Average similarity: {similarity}")
    print(f"Average recall@1: {recall}")
    print("Results saved to: ", args.result_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
