"""System base: component assembly + the single jitted train step.

Parity target: reference `threestudio/systems/base.py:27-342`
(BaseSystem/BaseLift3DSystem): builds geometry/material/background into a
renderer, owns guidance + prompt processor, parses optimizer groups, exposes
train/val/test behavior.

TPU-native design (SURVEY.md §7.1): instead of PL hooks + Updateable walks,
the system compiles ONE `train_step(state, guidance_params, batch, scalars,
rng)` XLA program containing rendering, frozen-diffusion guidance, loss
assembly and the optimizer update. All annealed quantities (loss lambdas,
min/max t, grad clip, cos anneal) are traced scalar inputs evaluated
host-side per step via C() — no retraces across the whole schedule.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import find
from ..core.base import BaseObject
from ..core.config import parse_structured
from ..core.schedule import C
from ..models.renderers.occupancy import (OccGridState, init_occgrid,
                                          update_occgrid)
from . import losses
from .optimizers import parse_optimizer

logger = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    occ_grid: Optional[OccGridState]
    step: jnp.ndarray


@dataclass
class LossConfig:
    lambda_asd: Any = 1.0
    lambda_orient: Any = 0.0
    lambda_sparsity: Any = 0.0
    lambda_opaque: Any = 0.0
    lambda_z_variance: Any = 0.0
    lambda_eikonal: Any = 0.0
    lambda_normal_consistency: Any = 0.0
    lambda_laplacian_smoothness: Any = 0.0
    # geometry-guidance weight for the combined stages; coarse+geometry
    # hard-codes 0.5 in the reference (scaledreamer.py:124), geometry+texture
    # reads cfg.loss.lambda_geo (:158)
    lambda_geo: float = 0.5


class BaseLift3DSystem(BaseObject):
    @dataclass
    class Config:
        stage: str = "coarse"
        geometry_type: str = ""
        geometry: dict = field(default_factory=dict)
        geometry_convert_from: Optional[str] = None
        geometry_convert_inherit_texture: bool = False
        geometry_convert_override: dict = field(default_factory=dict)
        material_type: str = ""
        material: dict = field(default_factory=dict)
        background_type: str = ""
        background: dict = field(default_factory=dict)
        renderer_type: str = ""
        renderer: dict = field(default_factory=dict)
        guidance_type: str = ""
        guidance: dict = field(default_factory=dict)
        prompt_processor_type: str = ""
        prompt_processor: dict = field(default_factory=dict)
        # export path (reference systems/base.py Config: exporter driven in
        # predict, mesh_exporter.py)
        exporter_type: str = "mesh-exporter"
        exporter: dict = field(default_factory=dict)
        loss: dict = field(default_factory=dict)
        optimizer: dict = field(default_factory=dict)
        scheduler: Optional[dict] = None
        weights: Optional[str] = None
        weights_ignore_modules: Optional[list] = None
        cleanup_after_validation_step: bool = False
        cleanup_after_test_step: bool = False
        visualize_samples: bool = False
        validation_via_video: bool = False
        loggers: dict = field(default_factory=dict)

    cfg: Config

    def configure(self) -> None:
        geo_cls = find(self.cfg.geometry_type)
        mat_cls = find(self.cfg.material_type)
        bg_cls = find(self.cfg.background_type)
        rend_cls = find(self.cfg.renderer_type)
        geo_parsed = parse_structured(geo_cls.Config, self.cfg.geometry)
        if getattr(rend_cls, "requires_full_image", False) and \
                self.cfg.stage != "texture" and \
                hasattr(geo_parsed, "pos_encoding_config"):
            # Mesh rasterization feeds DIFFERENTIABLE pixel positions
            # (functions of marching-tets vertices, hence of the SDF params)
            # into geometry(); the default compute_x_grad=False would
            # silently zero the image-guidance gradient to vertex positions
            # through the hash encode. Force it on whenever the geometry is
            # trainable under a mesh renderer (texture stage freezes
            # geometry, so the cheap path stays legal there).
            import dataclasses as _dc
            pec = dict(geo_parsed.pos_encoding_config or {})
            if pec.get("compute_x_grad") is False:
                import logging
                logging.getLogger(__name__).warning(
                    "pos_encoding_config.compute_x_grad=false is overridden "
                    "to true: stage %r renders a trainable geometry through "
                    "mesh rasterization, where query positions carry the "
                    "image-guidance gradient to the vertices.",
                    self.cfg.stage)
            pec["compute_x_grad"] = True
            geo_parsed = _dc.replace(geo_parsed, pos_encoding_config=pec)
        self.geometry = geo_cls(cfg=geo_parsed)
        self.material = mat_cls(
            cfg=parse_structured(mat_cls.Config, self.cfg.material))
        self.background = bg_cls(
            cfg=parse_structured(bg_cls.Config, self.cfg.background))
        self.renderer = rend_cls(
            cfg=parse_structured(rend_cls.Config, self.cfg.renderer),
            geometry=self.geometry, material=self.material,
            background=self.background)
        self.loss_cfg = parse_structured(LossConfig, self.cfg.loss)
        self.guidance = None
        self.prompt_processor = None
        self.prompt_utils = None
        self.guidance_params = None

    # ------------------------------------------------------------------
    def on_fit_start(self, rng: jax.Array) -> None:
        """Build guidance + prompt processor (reference
        scaledreamer.py:38-45 / on_fit_start)."""
        if self.guidance is None:
            g_cls = find(self.cfg.guidance_type)
            self.guidance = g_cls(
                cfg=parse_structured(g_cls.Config, self.cfg.guidance))
            self.guidance_params = self.guidance.init_params(rng)
        if self.prompt_processor is None and self.cfg.prompt_processor_type:
            p_cls = find(self.cfg.prompt_processor_type)
            self.prompt_processor = p_cls(
                cfg=parse_structured(p_cls.Config, self.cfg.prompt_processor))
            self.prompt_utils = self._static_prompt_utils()

    def _static_prompt_utils(self):
        """Single-prompt systems compute prompt_utils once at fit start
        (reference scaledreamer.py:38-45); amortized systems return None and
        build per-batch utils instead."""
        return self.prompt_processor()

    # ------------------------------------------------------------------
    @staticmethod
    def init_rays(sample_batch: Dict, renderer) -> tuple:
        """Rays for flax param init, spatially capped.

        `flax.linen.Module.init` runs the renderer forward EAGERLY
        (unjitted, op-by-op): at the reference sd_nerf workload's 256²
        stage (15k of 25k steps — reference
        configs/single-prompt_benchmark/asd_sd_nerf.yaml resolution
        milestone) the 65536-ray × 512-sample point set materializes
        multi-GB per-op intermediates, and the 33.5M-row dense-table
        gather crashes the TPU compile helper (r5 measured,
        outputs/_measure_r5/). Param shapes never depend on the ray
        count, so init uses a spatial slice capped at the 64² training
        shape — or the renderer's declared minimum (`min_init_hw`, e.g.
        the patch renderer must fit one full patch)."""
        ro = jnp.asarray(sample_batch["rays_o"])
        rd = jnp.asarray(sample_batch["rays_d"])
        cap = max(64, int(getattr(renderer, "min_init_hw", 0) or 0))
        ih, iw = min(ro.shape[1], cap), min(ro.shape[2], cap)
        return ro[:, :ih, :iw], rd[:, :ih, :iw]

    def init_state(self, rng: jax.Array, sample_batch: Dict) -> TrainState:
        rngs = {"params": rng, "sampling": jax.random.fold_in(rng, 1),
                "aug": jax.random.fold_in(rng, 2),
                "noise": jax.random.fold_in(rng, 3)}
        init_extra = {}
        if getattr(self.renderer, "requires_full_image", False):
            init_extra["mvp_mtx"] = jnp.asarray(sample_batch["mvp_mtx"])
            init_extra["camera_positions"] = jnp.asarray(
                sample_batch["camera_positions"])
        init_o, init_d = self.init_rays(sample_batch, self.renderer)
        variables = self.renderer.init(
            rngs, init_o, init_d,
            light_positions=jnp.asarray(sample_batch["light_positions"]),
            train=True, **init_extra)
        params = variables["params"]
        if self.cfg.weights is not None:
            params = self.load_weights(params, self.cfg.weights)
        if self.cfg.geometry_convert_from:
            params = self.convert_geometry(params,
                                           self.cfg.geometry_convert_from)
        rcfg = self.renderer.cfg
        ocfg = dict(self.cfg.optimizer)
        if getattr(rcfg, "estimator", None) == "proposal" and \
                "prop_net" in params and \
                "prop_net" not in (ocfg.get("params") or {}):
            # inject the standalone optimizer group the reference builds a
            # SEPARATE optimizer from (prop_optimizer_config,
            # nerf_volume_renderer.py:76-88): explicit `name` means no
            # main-arg inheritance, and skip_zero_grad makes gated-off
            # steps true no-ops (the reference only .step()s the prop
            # optimizer on requires_grad steps)
            pcfg = dict(getattr(rcfg, "prop_optimizer_config", None) or {})
            group = dict(pcfg.get("args", {})) or {"lr": 1e-2}
            group["name"] = pcfg.get("name", "Adam")
            group["skip_zero_grad"] = True
            if getattr(rcfg, "prop_scheduler_config", None):
                group["scheduler"] = rcfg.prop_scheduler_config
            groups = dict(ocfg.get("params") or {})
            if not groups:
                # no per-module groups existed: synthesize one per other
                # top-level module so everything else keeps training under
                # the main optimizer (unlisted would mean frozen)
                for k in params:
                    if k != "prop_net":
                        groups[k] = {}
            groups["prop_net"] = group
            ocfg["params"] = groups
            logger.info("proposal estimator: optimizing prop_net with "
                        "group %s", group)
        tx = parse_optimizer(ocfg, params,
                             scheduler_cfg=self.cfg.scheduler)
        accum = int(getattr(self, "grad_accum", 1))
        if accum > 1:
            # trainer.accumulate_grad_batches parity (reference configs use
            # 2/8 for the triplane runs) via optax MultiSteps
            import optax as _optax
            tx = _optax.MultiSteps(tx, every_k_schedule=accum)
        self.tx = tx
        opt_state = tx.init(params)
        occ = None
        if getattr(rcfg, "estimator", None) == "occgrid":
            occ = init_occgrid(rcfg.grid_resolution, rcfg.radius)
        n_params = sum(x.size for x in jax.tree.leaves(params))
        logger.info("Initialized system with %.2fM parameters",
                    n_params / 1e6)
        return TrainState(params, opt_state, occ, jnp.zeros([], jnp.int32))

    def load_weights(self, params, path: str):
        """Weights-only init (reference systems/base.py:52-62), honoring
        `weights_ignore_modules` (top-level subtrees kept at fresh init)
        and the `path:module_name` surgery syntax (reference
        utils/base.py:103-112 + misc.py load_module_weights): only the
        named top-level module is loaded, everything else stays fresh."""
        import flax.serialization as ser
        module_name = None
        if ":" in path and not os.path.exists(path):
            path, module_name = path.rsplit(":", 1)
        with open(path, "rb") as f:
            raw = f.read()
        if module_name is not None:
            loaded_all = ser.msgpack_restore(raw).get("params", {})
            if module_name not in loaded_all:
                raise KeyError(
                    f"weights module '{module_name}' not in checkpoint "
                    f"(has {sorted(loaded_all)})")
            out = dict(params)
            out[module_name] = jax.tree.map(
                jnp.asarray, loaded_all[module_name])
            return out
        loaded = ser.from_bytes({"params": params}, raw)["params"]
        ignore = set(self.cfg.weights_ignore_modules or [])
        if ignore:
            loaded = dict(loaded)
            for name in ignore:
                if name in params:
                    loaded[name] = params[name]
        return loaded

    def convert_geometry(self, params, ckpt_path: str):
        """Cross-stage geometry conversion (`geometry_convert_from`,
        reference systems/base.py:250-292 + geometry `create_from`):
        copy structurally-matching geometry subtrees (encoding +
        density/sdf/feature networks) from a previous-stage checkpoint."""
        import flax.serialization as ser
        from flax.traverse_util import flatten_dict, unflatten_dict
        with open(ckpt_path, "rb") as f:
            raw = f.read()
        # deserialize with a permissive template: read the geometry subtree
        loaded = ser.msgpack_restore(raw)
        prev_geo = loaded.get("params", {}).get("geometry", {})
        new_geo = flatten_dict(params["geometry"])
        prev_flat = flatten_dict(prev_geo)
        copied = 0
        inherit_texture = bool(self.cfg.geometry_convert_inherit_texture)
        for k, v in prev_flat.items():
            if not inherit_texture and any(
                    "feature" in str(part) for part in k):
                # reference create_from(copy_net=False): texture/feature
                # nets start fresh in the new stage unless
                # geometry_convert_inherit_texture is set
                continue
            v = jnp.asarray(v)
            if k in new_geo and new_geo[k].shape == v.shape:
                new_geo[k] = v.astype(new_geo[k].dtype)
                copied += 1
        logger.info("geometry_convert_from %s: copied %d/%d matching params",
                    ckpt_path, copied, len(new_geo))
        params = dict(params)
        params["geometry"] = unflatten_dict(new_geo)
        return params

    # ------------------------------------------------------------------
    def schedule_scalars(self, epoch: int, global_step: int) -> Dict[str, np.ndarray]:
        """Evaluate every C()-scheduled scalar host-side (one dict of
        np scalars -> traced jit inputs)."""
        out = {}
        for name in ("lambda_asd", "lambda_orient", "lambda_sparsity",
                     "lambda_opaque", "lambda_z_variance", "lambda_eikonal",
                     "lambda_normal_consistency",
                     "lambda_laplacian_smoothness"):
            out[name] = np.float32(
                C(getattr(self.loss_cfg, name), epoch, global_step))
        for k, v in self.guidance.schedule_scalars(epoch, global_step).items():
            out[k] = np.float32(v)
        rcfg = self.renderer.cfg
        if getattr(rcfg, "cos_anneal_end_steps", 0):
            out["cos_anneal_ratio"] = np.float32(
                min(1.0, global_step / rcfg.cos_anneal_end_steps))
        else:
            out["cos_anneal_ratio"] = np.float32(1.0)
        gcfg = self.geometry.cfg
        if getattr(self.geometry, "accepts_truncation_psi", False):
            # C()-annealed StyleGAN truncation (reference
            # stylegan_3dconv_net.py:419-421 update_step)
            out["truncation_psi"] = np.float32(
                C(gcfg.truncation_psi, epoch, global_step))
        if getattr(rcfg, "estimator", None) == "proposal":
            out["prop_grad_gate"] = np.float32(
                1.0 if self._proposal_requires_grad(global_step) else 0.0)
        return out

    def _proposal_requires_grad(self, step: int, target: float = 5.0,
                                num_steps: int = 1000) -> bool:
        """Stateful every-N gating of the prop-net loss (reference
        get_proposal_requires_grad_fn, nerf_volume_renderer.py:90-108):
        starts updating every step, anneals toward every `target` steps."""
        since = getattr(self, "_prop_steps_since_grad", 0)
        requires = since > min(step / num_steps, 1.0) * target
        if requires:
            since = 0
        self._prop_steps_since_grad = since + 1
        return requires

    # ------------------------------------------------------------------
    def compute_regularization_losses(self, out: Dict, scalars: Dict,
                                      metrics: Dict) -> jnp.ndarray:
        loss = 0.0
        if "prop_loss" in out:
            # proposal-estimator interlevel loss (detached from the radiance
            # field; trains only the prop_net param group), gated every N
            # steps like the reference's proposal_requires_grad_fn
            metrics["loss_prop"] = out["prop_loss"]
            loss = loss + out["prop_loss"] * scalars.get(
                "prop_grad_gate", 1.0)
        if "coarse" in self.cfg.stage:
            if not _sched_is_zero(self.loss_cfg.lambda_orient) and "normal" in out:
                l = losses.orient_loss(out["weights"], out["normal"],
                                       out["t_dirs"], out["opacity"])
                metrics["loss_orient"] = l
                loss = loss + l * scalars["lambda_orient"]
            if not _sched_is_zero(self.loss_cfg.lambda_sparsity):
                l = losses.sparsity_loss(out["opacity"])
                metrics["loss_sparsity"] = l
                loss = loss + l * scalars["lambda_sparsity"]
            if not _sched_is_zero(self.loss_cfg.lambda_opaque):
                l = losses.opaque_loss(out["opacity"])
                metrics["loss_opaque"] = l
                loss = loss + l * scalars["lambda_opaque"]
            if not _sched_is_zero(self.loss_cfg.lambda_z_variance):
                l = losses.z_variance_loss(out["z_variance"], out["opacity"])
                metrics["loss_z_variance"] = l
                loss = loss + l * scalars["lambda_z_variance"]
            if not _sched_is_zero(self.loss_cfg.lambda_eikonal) and \
                    "sdf_grad" in out:
                l = losses.eikonal_loss(out["sdf_grad"])
                metrics["loss_eikonal"] = l
                loss = loss + l * scalars["lambda_eikonal"]
        if self.cfg.stage in ("geometry", "geometry+texture"):
            # mesh-stage regularizers (reference scaledreamer.py:133-146);
            # computed in-graph by the mesh renderer (fixed-shape masked
            # topology) and surfaced as scalars
            if "loss_normal_consistency" in out:
                l = out["loss_normal_consistency"]
                metrics["loss_normal_consistency"] = l
                loss = loss + l * scalars["lambda_normal_consistency"]
            if "loss_laplacian_smoothness" in out and \
                    not _sched_is_zero(
                        self.loss_cfg.lambda_laplacian_smoothness):
                l = out["loss_laplacian_smoothness"]
                metrics["loss_laplacian_smoothness"] = l
                loss = loss + l * scalars["lambda_laplacian_smoothness"]
        return loss

    # ------------------------------------------------------------------
    def prepare_batch(self, batch: Dict) -> Dict:
        """Host-side batch augmentation before the jitted step (overridden by
        the amortized system to inject per-prompt embedding arrays)."""
        from ..core import typing as sdtyping
        sdtyping.check_batch(batch)
        return batch

    def build_prompt_utils(self, batch: Dict):
        """Prompt utils for this step; base systems use the static
        single-prompt output (reference scaledreamer.py:38-45)."""
        return self.prompt_utils

    def render_kwargs(self, batch: Dict) -> Dict:
        """Extra traced kwargs for the renderer (amortized: noise/text_embed)."""
        return {}

    def make_train_step(self, mesh=None):
        """Build the jitted train step. With a Mesh, batch is sharded over
        the 'data' axis and params replicated (GSPMD inserts the grad psum)."""
        renderer = self.renderer
        guidance = self.guidance
        tx = self.tx
        guidance_call = guidance.__call__

        import os
        remat_renderer = os.environ.get("SDTPU_REMAT_RENDERER", "1") != "0"

        def train_step(state: TrainState, guidance_params, batch, scalars,
                       rng):
            k_render, k_aug, k_guidance, k_noise = jax.random.split(rng, 4)
            prompt_utils = self.build_prompt_utils(batch)

            extra_kwargs = dict(self.render_kwargs(batch))
            if "truncation_psi" in scalars:
                extra_kwargs["truncation_psi"] = scalars["truncation_psi"]
            if getattr(renderer, "requires_full_image", False):
                # mesh rasterization projects with the camera matrices
                extra_kwargs["mvp_mtx"] = batch["mvp_mtx"]
                extra_kwargs["camera_positions"] = batch.get(
                    "camera_positions")

            def render_fn(params):
                return renderer.apply(
                    {"params": params},
                    batch["rays_o"], batch["rays_d"],
                    light_positions=batch["light_positions"],
                    occ_grid=state.occ_grid, train=True,
                    cos_anneal_ratio=scalars.get("cos_anneal_ratio", 1.0),
                    rngs={"sampling": k_render, "aug": k_aug,
                          "noise": k_noise},
                    **extra_kwargs)

            if remat_renderer:
                # recompute rendering in the backward pass instead of saving
                # point-pipeline residuals (tile-padded [N, small] tensors
                # dominate HBM otherwise; trades ~1 extra renderer fwd)
                render_fn = jax.checkpoint(render_fn)

            stage = self.cfg.stage

            def call_guidance(rng_g, guidance_inp):
                return guidance_call(
                    guidance_params, rng_g, guidance_inp,
                    prompt_utils,
                    elevation=batch["elevation"], azimuth=batch["azimuth"],
                    camera_distances=batch["camera_distances"],
                    min_step_percent=scalars["min_step_percent"],
                    max_step_percent=scalars["max_step_percent"],
                    grad_clip_val=scalars.get("grad_clip_val"),
                    rgb_as_latents=bool(getattr(self.cfg, "rgb_as_latents",
                                                False)),
                    c2w=batch.get("c2w"), fovy=batch.get("fovy"))

            def loss_fn(params):
                out = render_fn(params)
                # stage-dependent guidance input (reference
                # scaledreamer.py:50-60): geometry distills on the normal
                # image, every other stage on comp_rgb. The reference zeroes
                # non-finite values before guidance (nan_to_num(nan=0,
                # posinf=0, neginf=0)); defaults would map inf to ~3.4e38
                # and blow up the guidance instead.
                guidance_inp = (out["comp_normal"] if stage == "geometry"
                                else out["comp_rgb"])
                guidance_inp = jnp.nan_to_num(guidance_inp, nan=0.0,
                                              posinf=0.0, neginf=0.0)
                g_out = call_guidance(k_guidance, guidance_inp)
                metrics = {"loss_asd": g_out["loss_asd"],
                           "grad_norm": g_out["grad_norm"]}
                loss = g_out["loss_asd"] * scalars["lambda_asd"]
                if stage in ("coarse+geometry", "geometry+texture"):
                    # second guidance pass on the normal image (reference
                    # scaledreamer.py:116-128,147-160)
                    lambda_geo = (0.5 if stage == "coarse+geometry"
                                  else self.loss_cfg.lambda_geo)
                    g2 = call_guidance(
                        jax.random.fold_in(k_guidance, 1),
                        jnp.nan_to_num(out["comp_normal"], nan=0.0,
                                       posinf=0.0, neginf=0.0))
                    metrics["shape_loss_asd"] = g2["loss_asd"]
                    loss = loss + (lambda_geo * scalars["lambda_asd"]
                                   * g2["loss_asd"])
                loss = loss + self.compute_regularization_losses(
                    out, scalars, metrics)
                metrics["loss"] = loss
                sc = out.get("space_cache")
                if isinstance(sc, dict) and "w" in sc:
                    # mapping-output mean for the w_avg EMA (detached)
                    metrics["_w_mean"] = jnp.mean(sc["w"], axis=0)
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            w_mean = metrics.pop("_w_mean", None)
            if w_mean is not None:
                new_params = _apply_w_avg_ema(new_params, w_mean)
            new_state = TrainState(new_params, new_opt_state, state.occ_grid,
                                   state.step + 1)
            return new_state, metrics

        # With a mesh, the computation's sharding follows the argument
        # shardings (trainer device_puts the batch over the 'data' axis and
        # params replicated); GSPMD inserts the gradient psum automatically.
        return jax.jit(train_step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def make_occgrid_update(self):
        renderer = self.renderer
        rcfg = renderer.cfg
        geometry = self.geometry

        if getattr(rcfg, "estimator", None) != "occgrid":
            return None
        render_step_size = 1.732 * 2 * rcfg.radius / rcfg.num_samples_per_ray

        def occ_update(state: TrainState, rng):
            def density_fn(pts):
                if hasattr(geometry, "forward_sdf"):
                    # SDF geometry: use volsdf density proxy with fixed scale
                    from ..ops.render import volsdf_density
                    sdf = geometry.apply({"params": state.params["geometry"]},
                                         pts, method=geometry.forward_sdf)
                    return volsdf_density(sdf, 30.0)
                return geometry.apply({"params": state.params["geometry"]},
                                      pts, method=geometry.forward_density)

            occ = update_occgrid(state.occ_grid, density_fn, rng,
                                 rcfg.grid_resolution, rcfg.radius,
                                 render_step_size)
            return state._replace(occ_grid=occ)

        return jax.jit(occ_update, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def make_eval_render(self, chunk_rays: int = 65536, mesh=None):
        """Chunked full-image eval renderer (reference eval_chunk_size).

        With a Mesh, big eval images are shard_map'd over the RAY axis
        (SURVEY.md §5 long-context analog: rays are independent; params
        replicate; each device renders its contiguous ray block with no
        collectives) instead of sequential host chunking."""
        renderer = self.renderer

        if mesh is not None and not getattr(renderer, "requires_full_image",
                                            False):
            from ..parallel import make_ray_sharded_render

            def chunk_fn(params, ro, rd, extra):
                n = ro.shape[0]
                out = renderer.apply(
                    {"params": params}, ro.reshape(1, n, 1, 3),
                    rd.reshape(1, n, 1, 3),
                    light_positions=extra["light_positions"], train=False)
                return {k: out[k].reshape(n, -1)
                        for k in ("comp_rgb", "opacity", "depth",
                                  "comp_normal") if k in out}

            sharded = make_ray_sharded_render(mesh, chunk_fn)

            def render_sharded(params, batch):
                B, H, W, _ = batch["rays_o"].shape
                assert B == 1, "eval renders one camera at a time"
                ro = jnp.asarray(batch["rays_o"]).reshape(-1, 3)
                rd = jnp.asarray(batch["rays_d"]).reshape(-1, 3)
                extra = {"light_positions": jnp.asarray(
                    batch["light_positions"])}
                out = sharded(params, ro, rd, extra)
                return {k: np.asarray(v).reshape(H, W, -1)
                        for k, v in out.items()}

            return render_sharded

        if getattr(renderer, "requires_full_image", False):
            # mesh rasterization consumes whole cameras, not ray chunks
            @jax.jit
            def render_full(params, rays_o, rays_d, light, mvp, campos):
                return renderer.apply(
                    {"params": params}, rays_o, rays_d,
                    light_positions=light, train=False,
                    mvp_mtx=mvp, camera_positions=campos)

            def render_mesh(params, batch):
                out = render_full(
                    params, jnp.asarray(batch["rays_o"]),
                    jnp.asarray(batch["rays_d"]),
                    jnp.asarray(batch["light_positions"]),
                    jnp.asarray(batch["mvp_mtx"]),
                    jnp.asarray(batch["camera_positions"]))
                return {k: np.asarray(out[k])[0]
                        for k in ("comp_rgb", "opacity", "depth",
                                  "comp_normal") if k in out}

            return render_mesh

        @jax.jit
        def render_chunk(params, rays_o, rays_d, light_positions):
            return renderer.apply(
                {"params": params}, rays_o, rays_d,
                light_positions=light_positions, train=False)

        def render(params, batch):
            B, H, W, _ = batch["rays_o"].shape
            n = H * W
            rays_o = np.asarray(batch["rays_o"]).reshape(B * n, 3)
            rays_d = np.asarray(batch["rays_d"]).reshape(B * n, 3)
            light = np.asarray(batch["light_positions"])
            assert B == 1, "eval renders one camera at a time"
            chunks = []
            total = rays_o.shape[0]
            csize = min(chunk_rays, total)
            n_chunks = (total + csize - 1) // csize
            pad = n_chunks * csize - total
            if pad:
                rays_o = np.concatenate([rays_o, rays_o[:pad]], 0)
                rays_d = np.concatenate([rays_d, rays_d[:pad]], 0)
            outs = []
            for i in range(n_chunks):
                ro = jnp.asarray(rays_o[i * csize:(i + 1) * csize]
                                 ).reshape(1, csize, 1, 3)
                rd = jnp.asarray(rays_d[i * csize:(i + 1) * csize]
                                 ).reshape(1, csize, 1, 3)
                outs.append(render_chunk(params, ro, rd, jnp.asarray(light)))
            merged = {}
            for k in ("comp_rgb", "opacity", "depth", "comp_normal"):
                if k in outs[0]:
                    v = np.concatenate(
                        [np.asarray(o[k]).reshape(csize, -1) for o in outs], 0)
                    if pad:
                        v = v[:-pad]
                    merged[k] = v.reshape(H, W, -1)
            return merged

        return render


def _apply_w_avg_ema(params, w_mean, beta: float = 0.995):
    """Functional StyleGAN w_avg EMA: w_avg <- beta*w_avg + (1-beta)*mean(w).

    The reference registers the buffer with w_avg_beta=0.995 but ships the
    in-place update commented out (stylegan_3dconv_modules.py:318-319);
    completed here. The buffer is a gradient-frozen param
    (.../mapping/w_avg) updated after the optimizer step."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = flatten_dict(params)
    for k in flat:
        if k[-1] == "w_avg":
            flat[k] = beta * flat[k] + (1.0 - beta) * w_mean
    return unflatten_dict(flat)


def _sched_is_zero(spec) -> bool:
    """True if a C() spec is identically zero (branch pruned at trace time)."""
    if isinstance(spec, (int, float)):
        return spec == 0
    return False
