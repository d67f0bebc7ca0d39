"""`multiprompt-camera-datamodule`: camera sampling + per-batch prompts.

Parity target: reference `custom/amortized/data/multiprompt.py:20-242`:
- training collate = random cameras + gaussian `noise` [B, dim_gaussian] +
  per-batch random prompt sample from the *process-local* shard of the
  prompt library (`[rank::world]`, :180-186 — SURVEY.md §2.2),
- eval datasets iterate prompts with circular orbits; noise interpolates
  between two fixed gaussian endpoints across views,
- fixed-prompt eval variant (`eval_prompt`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from .. import register
from ..core.base import BaseObject
from ..core.config import parse_structured
from .uncond import (RandomCameraDataModuleConfig, RandomCameraDataset,
                     RandomCameraIterableDataset)


@dataclass
class MultipromptRandomCameraDataModuleConfig(RandomCameraDataModuleConfig):
    dim_gaussian: int = 512
    prompt_library: str = "magic3d_prompt_library"
    prompt_library_dir: str = "load"
    prompt_library_format: str = "json"
    eval_prompt: Optional[str] = None
    target_prompt: Optional[str] = None
    eval_fix_camera: Optional[int] = None


def load_prompt_library(cfg, shard_train: bool = True) -> Dict[str, List[str]]:
    path = os.path.join(cfg.prompt_library_dir,
                        f"{cfg.prompt_library}.{cfg.prompt_library_format}")
    with open(path) as f:
        library = json.load(f)
    if shard_train:
        rank, world = jax.process_index(), jax.process_count()
        library = {
            split: (prompts[rank::world] if split == "train" else prompts)
            for split, prompts in library.items()
        }
    return library


class MultipromptRandomCameraIterableDataset(RandomCameraIterableDataset):
    """Training sampler (reference multiprompt.py:62-84)."""

    def __init__(self, cfg, prompt_library: Dict, rng=None):
        super().__init__(cfg, rng=rng)
        assert "train" in prompt_library
        self.prompt_library = list(prompt_library["train"])

    def collate(self, _batch=None) -> dict:
        batch = super().collate()
        B = self.batch_size
        batch["noise"] = self.rng.standard_normal(
            (B, self.cfg.dim_gaussian)).astype(np.float32)
        if len(self.prompt_library) < B:
            idx = self.rng.integers(0, len(self.prompt_library), B)
        else:
            idx = self.rng.choice(len(self.prompt_library), B, replace=False)
        batch["prompt"] = [self.prompt_library[i] for i in idx]
        return batch


class MultipromptRandomCameraDataset4Test:
    """Per-prompt circular orbit eval (reference multiprompt.py:87-140):
    iterates (prompt, view) pairs; noise interpolates between two gaussian
    endpoints across the orbit."""

    def __init__(self, cfg, split: str, prompt_library: Dict, seed: int = 0):
        self.camera_dataset = RandomCameraDataset(cfg, split)
        self.cfg = cfg
        self.n_views = self.camera_dataset.n_views
        rng = np.random.default_rng(seed)
        start = rng.standard_normal(cfg.dim_gaussian).astype(np.float32)
        end = rng.standard_normal(cfg.dim_gaussian).astype(np.float32)
        self.noises = np.stack([
            start + (end - start) * i / self.n_views
            for i in range(self.n_views)
        ])
        self.prompts = list(
            prompt_library.get(split, prompt_library.get("val", [])))

    def __len__(self):
        return len(self.prompts) * self.n_views

    def __iter__(self):
        for prompt in self.prompts:
            for i in range(self.n_views):
                batch = dict(self.camera_dataset[i])
                batch["noise"] = self.noises[i:i + 1]
                batch["prompt"] = [prompt]
                yield batch


class MultipromptRandomCameraDataset4FixPrompt(MultipromptRandomCameraDataset4Test):
    """Fixed-prompt eval (reference multiprompt.py:125-163
    Dataset4FixPrompt): ZERO noise, optional fixed camera
    (`eval_fix_camera`), and optional prompt interpolation — with
    `target_prompt` set, each view i carries (prompt_target, ratio_i) with
    ratio linspace(0,1); the system lerps the global text embeddings
    `ratio*emb(prompt) + (1-ratio)*emb(target)` (reference
    multiprompt_radience_field_generator.py:95-98)."""

    def __init__(self, cfg, split: str, prompt_library: Dict, seed: int = 0):
        super().__init__(cfg, split, prompt_library, seed)
        assert cfg.eval_prompt is not None
        self.prompts = [cfg.eval_prompt]
        self.noises = np.zeros((self.n_views, cfg.dim_gaussian), np.float32)
        self.target_prompt = cfg.target_prompt
        self.ratios = np.linspace(0.0, 1.0, self.n_views).astype(np.float32)
        self.fix_camera = cfg.eval_fix_camera

    def __iter__(self):
        for i in range(self.n_views):
            cam = self.fix_camera if self.fix_camera is not None else i
            batch = dict(self.camera_dataset[cam])
            batch["noise"] = self.noises[i:i + 1]
            batch["prompt"] = [self.prompts[0]]
            batch["index"] = i
            if self.target_prompt is not None:
                batch["prompt_target"] = [self.target_prompt]
                batch["ratio"] = self.ratios[i]
                batch["name"] = "_to_".join(
                    [self.prompts[0], self.target_prompt])
            yield batch


@register("multiprompt-camera-datamodule")
class MultipromptCameraDataModule(BaseObject):
    @dataclass
    class Config(MultipromptRandomCameraDataModuleConfig):
        pass

    def __init__(self, cfg=None, seed: int = 0):
        self.cfg = parse_structured(self.Config, cfg)
        self.seed = seed
        self.prompt_library = load_prompt_library(self.cfg)
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None

    def setup(self, stage=None):
        if stage in (None, "fit"):
            self.train_dataset = MultipromptRandomCameraIterableDataset(
                self.cfg, self.prompt_library,
                rng=np.random.default_rng(self.seed))
        if stage in (None, "fit", "validate"):
            if self.cfg.eval_prompt is not None:
                self.val_dataset = MultipromptRandomCameraDataset4FixPrompt(
                    self.cfg, "val", self.prompt_library, self.seed)
            else:
                self.val_dataset = MultipromptRandomCameraDataset4Test(
                    self.cfg, "val", self.prompt_library, self.seed)
        if stage in (None, "test", "predict"):
            self.test_dataset = MultipromptRandomCameraDataset4Test(
                self.cfg, "test", self.prompt_library, self.seed)

    def train_batch(self):
        return self.train_dataset.collate()
