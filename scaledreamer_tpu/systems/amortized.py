"""`multiprompt-radience-field-generator-system`: prompt-amortized training.

Parity target: reference
`custom/amortized/systems/multiprompt_radience_field_generator.py:18-396`:
- per-batch prompt -> embedding lookup in forward (:92-125) with
  `text_embed` injected into the renderer batch,
- same loss set as the single-prompt system,
- per-prompt test rendering into subdirectories + video assembly.

TPU-native: the prompt lookup happens host-side in `prepare_batch` (dict
lookups + np.stack, microseconds); the resulting fixed-shape embedding
arrays are traced inputs of the single jitted step, so varying prompts per
step never retrace.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import register
from ..models.prompt_processors.base import PromptProcessorOutput
from .base import BaseLift3DSystem


@register("multiprompt-radience-field-generator-system")
class MultipromptRadianceFieldGeneratorSystem(BaseLift3DSystem):
    @dataclass
    class Config(BaseLift3DSystem.Config):
        initialize_shape: bool = False
        validation_via_video: bool = True
        # renderer outputs 4-channel latents; guidance skips the VAE encode
        # and eval decodes them to RGB (reference
        # multiprompt_radience_field_generator.py:30,110-121)
        rgb_as_latents: bool = False

    cfg: Config

    def _static_prompt_utils(self):
        return None  # built per batch in build_prompt_utils

    # ------------------------------------------------------------------
    def prepare_batch(self, batch: Dict) -> Dict:
        """Host-side: prompt strings -> stacked embedding arrays
        (reference forward :92-125), including the prompt-interpolation
        eval path (`prompt_target` + `ratio` lerp of the GLOBAL embedding,
        reference :95-98)."""
        prompts = batch.get("prompt")
        if prompts is None or "text_embed" in batch:
            return batch
        po = self.prompt_processor(prompt=list(prompts))
        batch = dict(batch)
        batch["pp_local"] = np.asarray(po.text_embeddings)
        batch["pp_uncond"] = np.asarray(po.uncond_text_embeddings)
        batch["pp_vd"] = np.asarray(po.text_embeddings_vd)
        batch["pp_uncond_vd"] = np.asarray(po.uncond_text_embeddings_vd)
        text_embed = np.asarray(po.global_text_embeddings)
        if batch.get("prompt_target") is not None:
            po_t = self.prompt_processor(prompt=list(batch["prompt_target"]))
            ratio = np.float32(batch["ratio"])
            text_embed = (ratio * text_embed
                          + (1.0 - ratio)
                          * np.asarray(po_t.global_text_embeddings))
        batch["text_embed"] = text_embed
        return batch

    def build_prompt_utils(self, batch: Dict):
        pcfg = self.prompt_processor.cfg
        return PromptProcessorOutput(
            text_embeddings=batch["pp_local"],
            uncond_text_embeddings=batch["pp_uncond"],
            text_embeddings_vd=batch["pp_vd"],
            uncond_text_embeddings_vd=batch["pp_uncond_vd"],
            use_perp_neg=pcfg.use_perp_neg,
            perp_neg_f_sb=tuple(pcfg.perp_neg_f_sb),
            perp_neg_f_fsb=tuple(pcfg.perp_neg_f_fsb),
            perp_neg_f_fs=tuple(pcfg.perp_neg_f_fs),
            perp_neg_f_sf=tuple(pcfg.perp_neg_f_sf),
            prompt="", prompts_vd=[],
            overhead_threshold=pcfg.overhead_threshold,
            front_threshold=pcfg.front_threshold,
            back_threshold=pcfg.back_threshold,
            global_text_embeddings=batch["text_embed"])

    def render_kwargs(self, batch: Dict) -> Dict:
        kwargs = {"text_embed": batch["text_embed"]}
        if "noise" in batch:
            kwargs["noise"] = batch["noise"]
        return kwargs

    def build_space_cache_for_prompt(self, state, prompt: str,
                                     noise_dim: int = 16):
        """Space cache for ONE prompt (zero noise, the Dataset4FixPrompt
        eval convention) — powers `--export` on amortized configs. Beyond
        the reference: its predict path cannot export the generators
        (hyper_iNGP.py:351-373 forward_field needs a space_cache the
        exporter never builds)."""
        po = self.prompt_processor(prompt=[prompt])
        text_embed = jnp.asarray(np.asarray(po.global_text_embeddings))
        noise = jnp.zeros((1, noise_dim), jnp.float32)
        return self.geometry.apply(
            {"params": state.params["geometry"]}, styles=noise,
            text_embed=text_embed,
            method=self.geometry.generate_space_cache)

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_batch):
        sample_batch = self.prepare_batch(sample_batch)
        rngs = {"params": rng, "sampling": jax.random.fold_in(rng, 1),
                "aug": jax.random.fold_in(rng, 2),
                "noise": jax.random.fold_in(rng, 3)}
        # spatially-capped init rays: flax init runs eagerly; see
        # BaseSystem.init_rays (render_kwargs entries are batch-level —
        # text_embed/noise — so only the rays need slicing)
        init_o, init_d = self.init_rays(sample_batch, self.renderer)
        variables = self.renderer.init(
            rngs, init_o, init_d,
            light_positions=jnp.asarray(sample_batch["light_positions"]),
            train=True, **{k: jnp.asarray(v) for k, v in
                           self.render_kwargs(sample_batch).items()})
        params = variables["params"]
        if self.cfg.weights is not None:
            params = self.load_weights(params, self.cfg.weights)
        if self.cfg.initialize_shape and self.cfg.weights is None:
            # 3DConv sphere pre-fit (reference multiprompt_radience_field_
            # generator.py:56-65 -> stylegan_3dconv_net.py:122-198)
            from ..models.geometry.stylegan_3dconv_net import (
                Voxel3DSdf, fit_shape_init_3dconv)
            if isinstance(self.geometry, Voxel3DSdf):
                n_fit = int(os.environ.get("SDTPU_SHAPE_INIT_STEPS", 1000))
                params = dict(params)
                params["geometry"] = fit_shape_init_3dconv(
                    self.geometry, params["geometry"], n_steps=n_fit)
        from .optimizers import parse_optimizer
        tx = parse_optimizer(self.cfg.optimizer, params,
                             scheduler_cfg=self.cfg.scheduler)
        accum = int(getattr(self, "grad_accum", 1))
        if accum > 1:
            import optax as _optax
            tx = _optax.MultiSteps(tx, every_k_schedule=accum)
        self.tx = tx
        opt_state = self.tx.init(params)
        from .base import TrainState
        import logging
        n_params = sum(x.size for x in jax.tree.leaves(params))
        logging.getLogger(__name__).info(
            "Initialized amortized system with %.2fM parameters",
            n_params / 1e6)
        return TrainState(params, opt_state, None, jnp.zeros([], jnp.int32))

    # ------------------------------------------------------------------
    def make_eval_render(self, chunk_rays: int = 65536, mesh=None):
        """Chunked eval with space_cache computed once per prompt
        (reference generative renderer inference branch :132-158).

        With a Mesh, rays are shard_map'd over the devices and the
        space_cache/params replicate — the amortized variant of the
        long-context ray sharding (SURVEY.md §5)."""
        renderer = self.renderer
        geometry = self.geometry

        @jax.jit
        def compute_cache(params, noise, text_embed):
            return geometry.apply(
                {"params": params["geometry"]}, styles=noise,
                text_embed=text_embed,
                method=geometry.generate_space_cache)

        if mesh is not None:
            from ..parallel import make_ray_sharded_render

            def chunk_fn(params, ro, rd, extra):
                n = ro.shape[0]
                out = renderer.apply(
                    {"params": params}, ro.reshape(1, n, 1, 3),
                    rd.reshape(1, n, 1, 3),
                    light_positions=extra["light_positions"],
                    noise=extra["noise"], text_embed=extra["text_embed"],
                    space_cache=extra["space_cache"], train=False)
                return {k: out[k].reshape(n, -1)
                        for k in ("comp_rgb", "opacity", "depth",
                                  "comp_normal") if k in out}

            sharded = make_ray_sharded_render(mesh, chunk_fn)

            def render_sharded(params, batch):
                B, H, W, _ = batch["rays_o"].shape
                assert B == 1
                noise = jnp.asarray(batch["noise"])
                text_embed = jnp.asarray(batch["text_embed"])
                cache = compute_cache(params, noise, text_embed)
                extra = {
                    "light_positions": jnp.asarray(
                        batch["light_positions"]),
                    "noise": noise, "text_embed": text_embed,
                    "space_cache": cache,
                }
                out = sharded(params,
                              jnp.asarray(batch["rays_o"]).reshape(-1, 3),
                              jnp.asarray(batch["rays_d"]).reshape(-1, 3),
                              extra)
                return {k: np.asarray(v).reshape(H, W, -1)
                        for k, v in out.items()}

            return self._wrap_latent_decode(render_sharded)

        @jax.jit
        def render_chunk(params, rays_o, rays_d, light_positions, noise,
                         text_embed, space_cache):
            return renderer.apply(
                {"params": params}, rays_o, rays_d,
                light_positions=light_positions, noise=noise,
                text_embed=text_embed, space_cache=space_cache, train=False)

        def render(params, batch):
            B, H, W, _ = batch["rays_o"].shape
            assert B == 1
            noise = jnp.asarray(batch["noise"])
            text_embed = jnp.asarray(batch["text_embed"])
            cache = compute_cache(params, noise, text_embed)
            n = H * W
            rays_o = np.asarray(batch["rays_o"]).reshape(n, 3)
            rays_d = np.asarray(batch["rays_d"]).reshape(n, 3)
            light = jnp.asarray(batch["light_positions"])
            csize = min(chunk_rays, n)
            n_chunks = (n + csize - 1) // csize
            pad = n_chunks * csize - n
            if pad:
                rays_o = np.concatenate([rays_o, rays_o[:pad]], 0)
                rays_d = np.concatenate([rays_d, rays_d[:pad]], 0)
            outs = []
            for i in range(n_chunks):
                ro = jnp.asarray(rays_o[i * csize:(i + 1) * csize]
                                 ).reshape(1, csize, 1, 3)
                rd = jnp.asarray(rays_d[i * csize:(i + 1) * csize]
                                 ).reshape(1, csize, 1, 3)
                outs.append(render_chunk(params, ro, rd, light, noise,
                                         text_embed, cache))
            merged = {}
            for k in ("comp_rgb", "opacity", "depth", "comp_normal"):
                if k in outs[0]:
                    v = np.concatenate(
                        [np.asarray(o[k]).reshape(csize, -1) for o in outs], 0)
                    if pad:
                        v = v[:-pad]
                    merged[k] = v.reshape(H, W, -1)
            return merged

        return self._wrap_latent_decode(render)

    def _wrap_latent_decode(self, render):
        """rgb_as_latents eval parity (reference :110-121): the renderer's
        4-channel latent image is VAE-decoded to `decoded_rgb` for
        saving; training consumes the latents directly."""
        if not self.cfg.rgb_as_latents:
            return render
        decode_jit = None

        def wrapped(params, batch):
            out = render(params, batch)
            nonlocal decode_jit
            if self.guidance is None or "comp_rgb" not in out:
                return out
            if decode_jit is None:
                guidance = self.guidance
                decode_jit = jax.jit(
                    lambda gp, lat: guidance.decode_latents(gp, lat))
            lat = jnp.asarray(out["comp_rgb"])[None]
            out["decoded_rgb"] = np.asarray(
                decode_jit(self.guidance_params, lat))[0]
            return out

        return wrapped

    def prepare_eval_batch(self, batch: Dict) -> Dict:
        return self.prepare_batch(batch)
