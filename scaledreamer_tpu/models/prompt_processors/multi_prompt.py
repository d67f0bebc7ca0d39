"""`stable-diffusion-multi-prompt-processor`: corpus-scale prompt embeddings.

Parity target: reference
`custom/amortized/models/prompt_processors/base.py:31-568` and
`stable_diffusion_multi_prompt_processor.py:14-92`:
- loads the prompt library JSON ({train,val,test}) SHARDED per process
  `[rank::world]` (base.py:169-188 — the scalability trick, SURVEY.md §2.2),
- caches BOTH local (77-token) and global (pooled) CLIP embeddings per
  prompt, md5-keyed on disk,
- per-batch `__call__(prompt=[...])` stacks cached arrays into a batched
  `PromptProcessorOutput` whose vd embeddings are per-sample [B, 4, 77, C].

The batched embedding selection runs inside the jitted step (see
base.PromptProcessorOutput — shared vs per-sample layouts both vectorized).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import register
from ...core.base import BaseObject
from .base import (DIRECTION_NAMES, PromptProcessorOutput,
                   direction_templates, hash_prompt)
from .stable_diffusion import (SD21_CTX, SD21_DIM, _pseudo_embedding,
                               encode_with_clip)

logger = logging.getLogger(__name__)


def _save_embedding_cache(model: str, prompts, local, glob, cache_dir: str):
    for v, l, g in zip(prompts, local, glob):
        np.save(os.path.join(cache_dir,
                             f"{hash_prompt(model, v, 'local')}.npy"),
                l.astype(np.float32))
        np.save(os.path.join(cache_dir,
                             f"{hash_prompt(model, v, 'global')}.npy"),
                g.astype(np.float32))


# corpus-scale bound on encode transients: embeddings are encoded and
# flushed to the cache CHUNK variants at a time, never all at once (100k
# prompts x 5 variants x 77x1024 f32 would be ~150 GB if stacked whole)
_ENCODE_CHUNK = 1024


def _spawn_encode_and_cache(model: str, prompts, cache_dir: str):
    """Subprocess target (reference spawn_func,
    custom/.../stable_diffusion_multi_prompt_processor.py:40-92): encode
    with CLIP and write the md5-keyed cache, then exit — releasing all
    encoder memory to the OS."""
    prompts = list(prompts)
    for i in range(0, len(prompts), _ENCODE_CHUNK):
        sub = prompts[i:i + _ENCODE_CHUNK]
        local, glob = encode_with_clip(model, sub)
        _save_embedding_cache(model, sub, local, glob, cache_dir)


@register("stable-diffusion-multi-prompt-processor")
class StableDiffusionMultiPromptProcessor(BaseObject):
    @dataclass
    class Config:
        prompt_library: str = "magic3d_prompt_library"
        prompt_library_dir: str = "load"
        prompt_library_format: str = "json"
        eval_prompt: Optional[str] = None
        eval_prompt_target: Optional[str] = None
        pretrained_model_name_or_path: str = "pretrained/stable-diffusion-2-1-base"
        negative_prompt: str = ""
        overhead_threshold: float = 60.0
        front_threshold: float = 45.0
        back_threshold: float = 45.0
        view_dependent_prompt_front: bool = False
        use_cache: bool = True
        spawn: bool = False
        cache_dir: str = ".sdtpu_cache/text_embeddings"
        use_perp_neg: bool = False
        perp_neg_f_sb: Tuple[float, float, float] = (1, 0.5, -0.606)
        perp_neg_f_fsb: Tuple[float, float, float] = (1, 0.5, +0.967)
        perp_neg_f_fs: Tuple[float, float, float] = (4, 0.5, -2.426)
        perp_neg_f_sf: Tuple[float, float, float] = (4, 0.5, -2.426)
        use_prompt_debiasing: bool = False
        use_local_text_embeddings: bool = False

    cfg: Config
    # corpus size above which locals are served from ONE packed memmap
    # (class attr so tests can lower it; see _load_packed_locals)
    _BIG_THRESHOLD = 512

    def configure(self) -> None:
        self.templates = direction_templates(
            self.cfg.view_dependent_prompt_front)
        self.negative_prompt = self.cfg.negative_prompt

        lib_path = os.path.join(
            self.cfg.prompt_library_dir,
            f"{self.cfg.prompt_library}.{self.cfg.prompt_library_format}")
        with open(lib_path) as f:
            library = json.load(f)
        # per-process shard [rank::world] (reference base.py:176-186)
        rank, world = jax.process_index(), jax.process_count()
        self.prompt_library = {
            split: prompts[rank::world] if split == "train" else prompts
            for split, prompts in library.items()
        }
        self.all_prompts = sorted(
            {p for split in self.prompt_library.values() for p in split}
            | {self.negative_prompt})
        logger.info("Prompt shard %d/%d: %d train prompts",
                    rank, world, len(self.prompt_library.get("train", [])))

        self.prepare_text_embeddings()
        self.load_text_embeddings()

    # ------------------------------------------------------------------
    def _cache_paths(self, prompt: str):
        model = self.cfg.pretrained_model_name_or_path
        return (
            os.path.join(self.cfg.cache_dir,
                         f"{hash_prompt(model, prompt, 'local')}.npy"),
            os.path.join(self.cfg.cache_dir,
                         f"{hash_prompt(model, prompt, 'global')}.npy"),
        )

    def _encode(self, prompts: List[str]):
        path = self.cfg.pretrained_model_name_or_path
        if os.path.isdir(str(path)):
            return encode_with_clip(str(path), prompts)
        logger.warning(
            "Text encoder not found at %s; deterministic pseudo-embeddings "
            "(offline mode).", path)
        local = np.stack(
            [_pseudo_embedding(p, SD21_CTX, SD21_DIM) for p in prompts])
        return local, local.mean(axis=1)

    def prepare_text_embeddings(self) -> None:
        os.makedirs(self.cfg.cache_dir, exist_ok=True)
        needed = []
        for p in self.all_prompts:
            variants = [p] + [self.templates[d](p) for d in DIRECTION_NAMES]
            for v in variants:
                lp, gp = self._cache_paths(v)
                if not (self.cfg.use_cache and os.path.exists(lp)
                        and os.path.exists(gp)):
                    needed.append(v)
        needed = list(dict.fromkeys(needed))
        if not needed:
            return
        logger.info("Encoding %d prompt variants...", len(needed))
        model = str(self.cfg.pretrained_model_name_or_path)
        if self.cfg.spawn and os.path.isdir(model):
            # reference parity (base.py:374-394): run the CLIP text encoder
            # in a spawned subprocess so its weights/activations are fully
            # returned to the OS before training allocates
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            proc = ctx.Process(
                target=_spawn_encode_and_cache,
                args=(model, needed, self.cfg.cache_dir))
            proc.start()
            proc.join()
            if proc.exitcode != 0:
                raise RuntimeError(
                    f"spawned text-encoder process failed "
                    f"(exit {proc.exitcode})")
            return
        for i in range(0, len(needed), _ENCODE_CHUNK):
            sub = needed[i:i + _ENCODE_CHUNK]
            local, glob = self._encode(sub)
            _save_embedding_cache(model, sub, local, glob,
                                  self.cfg.cache_dir)

    def load_text_embeddings(self) -> None:
        """Load the shard's embeddings (reference base.py:313-370).

        77-token local embeddings are MEMORY-MAPPED, not loaded: at CP100k
        scale the shard's locals are tens of GB (SURVEY §7.3-7) and each
        step touches only the sampled prompts' rows — np.stack at batch
        time pages in exactly those. Tiny pooled globals load eagerly.
        Above the `big` threshold all locals live in ONE packed memmap
        (per-file mmaps hold an fd each; 86k cache files blow EMFILE at
        DL17k scale — found by scripts/exercise_corpus_scale.py)."""
        self.local_text_embeddings = {}
        self.global_text_embeddings = {}
        self.text_embeddings_vd = {}
        big = len(self.all_prompts) > self._BIG_THRESHOLD
        if big:
            self._load_packed_locals()
            return
        for p in self.all_prompts:
            lp, gp = self._cache_paths(p)
            self.local_text_embeddings[p] = np.load(lp)
            self.global_text_embeddings[p] = np.load(gp)
            vd = []
            for d in DIRECTION_NAMES:
                lpd, _ = self._cache_paths(self.templates[d](p))
                vd.append(np.load(lpd))
            self.text_embeddings_vd[p] = np.stack(vd)

    def _load_packed_locals(self) -> None:
        """Corpus-scale locals: consolidate every variant's 77-token local
        into a single .npy, memory-map it ONCE, and hand out row views.
        One fd + demand paging of only the sampled rows, at any corpus
        size. The pack is keyed by (model, variant set) and built from the
        per-variant cache on first use (~sequential IO)."""
        import hashlib
        model = str(self.cfg.pretrained_model_name_or_path)
        variants = []
        for p in self.all_prompts:
            variants.append(p)
            variants.extend(self.templates[d](p) for d in DIRECTION_NAMES)
        variants = list(dict.fromkeys(variants))
        key = hashlib.md5(
            (model + "\x00".join(sorted(variants))).encode()).hexdigest()
        pack_path = os.path.join(self.cfg.cache_dir, f"pack_{key}.npy")
        idx_path = pack_path + ".index.json"
        if not (os.path.exists(pack_path) and os.path.exists(idx_path)):
            logger.info("Packing %d local embeddings into %s ...",
                        len(variants), pack_path)
            from numpy.lib import format as npfmt
            first = np.load(self._cache_paths(variants[0])[0])
            shape = (len(variants), *first.shape)
            # STREAM the rows through a plain file handle: a w+ memmap
            # would hold every written page dirty-resident (measured 20 GB
            # peak RSS at DL17k scale); sequential writes keep RSS flat
            with open(pack_path, "wb") as f:
                npfmt.write_array_header_1_0(
                    f, {"descr": "<f4", "fortran_order": False,
                        "shape": shape})
                for v in variants:
                    row = np.ascontiguousarray(
                        np.load(self._cache_paths(v)[0]), dtype=np.float32)
                    assert row.shape == first.shape, (v, row.shape)
                    row.tofile(f)
            with open(idx_path, "w") as f:
                json.dump({v: i for i, v in enumerate(variants)}, f)
        with open(idx_path) as f:
            index = json.load(f)
        pack = np.load(pack_path, mmap_mode="r")
        self._local_pack = pack  # ONE fd for every local embedding
        for p in self.all_prompts:
            self.local_text_embeddings[p] = pack[index[p]]
            self.global_text_embeddings[p] = np.load(self._cache_paths(p)[1])
            self.text_embeddings_vd[p] = [
                pack[index[self.templates[d](p)]] for d in DIRECTION_NAMES]

    # ------------------------------------------------------------------
    def __call__(self, prompt) -> PromptProcessorOutput:
        if isinstance(prompt, str):
            prompt = [prompt]
        for p in prompt:
            if p not in self.local_text_embeddings:
                raise ValueError(f"Prompt [{p}] is not in the prompt library.")
        neg = self.negative_prompt

        def vd_of(p):
            v = self.text_embeddings_vd[p]
            return np.stack(v) if isinstance(v, list) else v

        local = np.stack([self.local_text_embeddings[p] for p in prompt])
        glob = np.stack([self.global_text_embeddings[p] for p in prompt])
        vd = np.stack([vd_of(p) for p in prompt])
        global_embed = local if self.cfg.use_local_text_embeddings else glob
        # numpy, NOT jnp: prepare_batch feeds these straight into the jitted
        # step; jnp.asarray here would push to device only for prepare_batch
        # to pull them back (a full relay round trip, measured ~340 ms/step)
        return PromptProcessorOutput(
            text_embeddings=np.ascontiguousarray(local),
            uncond_text_embeddings=np.ascontiguousarray(
                self.local_text_embeddings[neg]),
            text_embeddings_vd=np.ascontiguousarray(vd),
            uncond_text_embeddings_vd=np.ascontiguousarray(vd_of(neg)),
            use_perp_neg=self.cfg.use_perp_neg,
            perp_neg_f_sb=self.cfg.perp_neg_f_sb,
            perp_neg_f_fsb=self.cfg.perp_neg_f_fsb,
            perp_neg_f_fs=self.cfg.perp_neg_f_fs,
            perp_neg_f_sf=self.cfg.perp_neg_f_sf,
            prompt=prompt[0],
            prompts_vd=list(prompt),
            overhead_threshold=self.cfg.overhead_threshold,
            front_threshold=self.cfg.front_threshold,
            back_threshold=self.cfg.back_threshold,
            global_text_embeddings=np.ascontiguousarray(global_embed),
        )


@register("dummy-multi-prompt-processor")
class DummyMultiPromptProcessor(StableDiffusionMultiPromptProcessor):
    """Offline multi-prompt processor: pseudo-embeddings, no weights."""

    @dataclass
    class Config(StableDiffusionMultiPromptProcessor.Config):
        pretrained_model_name_or_path: str = "__offline__"

    cfg: Config
