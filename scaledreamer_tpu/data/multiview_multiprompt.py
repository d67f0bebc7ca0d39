"""`multiprompt-multiview-camera-datamodule`.

Parity target: reference `custom/amortized/data/multiview_multiprompt.py:
20-146`: multiview camera sampling (n_view per scene) + per-scene prompt
sampling from the process-local shard + gaussian noise per scene.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .. import register
from ..core.base import BaseObject
from ..core.config import parse_structured
from .multiprompt import (MultipromptRandomCameraDataset4Test,
                          load_prompt_library)
from .uncond_multiview import (RandomMultiviewCameraDataModuleConfig,
                               RandomMultiviewCameraIterableDataset)


@dataclass
class MultiviewMultipromptDataModuleConfig(RandomMultiviewCameraDataModuleConfig):
    dim_gaussian: int = 512
    prompt_library: str = "magic3d_prompt_library"
    prompt_library_dir: str = "load"
    prompt_library_format: str = "json"
    eval_prompt: Optional[str] = None
    target_prompt: Optional[str] = None
    eval_fix_camera: Optional[int] = None


class MultiviewMultipromptIterableDataset(RandomMultiviewCameraIterableDataset):
    def __init__(self, cfg, prompt_library, rng=None):
        super().__init__(cfg, rng=rng)
        self.prompt_library = list(prompt_library["train"])

    def collate(self, _batch=None) -> dict:
        batch = super().collate()
        n_view = self.cfg.n_view
        rb = self.batch_size // n_view
        batch["noise"] = self.rng.standard_normal(
            (rb, self.cfg.dim_gaussian)).astype(np.float32)
        if len(self.prompt_library) < rb:
            idx = self.rng.integers(0, len(self.prompt_library), rb)
        else:
            idx = self.rng.choice(len(self.prompt_library), rb, replace=False)
        # one prompt per SCENE (repeated over its n_view cameras by the
        # renderer's space-cache repeat, reference generative renderer :108-118)
        batch["prompt"] = [self.prompt_library[i] for i in idx]
        return batch


@register("multiprompt-multiview-camera-datamodule")
class MultiviewMultipromptDataModule(BaseObject):
    @dataclass
    class Config(MultiviewMultipromptDataModuleConfig):
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
            self.train_dataset = MultiviewMultipromptIterableDataset(
                self.cfg, self.prompt_library,
                rng=np.random.default_rng(self.seed))
        if stage in (None, "fit", "validate"):
            self.val_dataset = MultipromptRandomCameraDataset4Test(
                self.cfg, "val", self.prompt_library, self.seed)
        if stage in (None, "test", "predict"):
            self.test_dataset = MultipromptRandomCameraDataset4Test(
                self.cfg, "test", self.prompt_library, self.seed)

    def train_batch(self):
        return self.train_dataset.collate()
