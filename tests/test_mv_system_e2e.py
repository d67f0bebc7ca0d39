"""End-to-end: Triplane-Transformer + MVDream-ASD through the full system
train step (the DL17k benchmark path, tiny sizes)."""

import json

import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured

sd.ensure_builtins()


@pytest.fixture(scope="module")
def mv_system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mv")
    lib = {"train": ["a cat", "a dog", "a fish"], "val": ["a cat"],
           "test": ["a cat"]}
    (tmp / "lib.json").write_text(json.dumps(lib))

    DM = sd.find("multiprompt-multiview-camera-datamodule")
    dm = DM(cfg=parse_structured(DM.Config, {
        "batch_size": 4, "n_view": 4, "width": 16, "height": 16,
        "relative_radius": True, "camera_distance_range": [0.8, 1.0],
        "fovy_range": [15, 60], "elevation_range": [0, 30],
        "dim_gaussian": 1, "prompt_library": "lib",
        "prompt_library_dir": str(tmp)}), seed=0)

    system_cls = sd.find("multiprompt-radience-field-generator-system")
    system = system_cls(cfg=parse_structured(system_cls.Config, {
        "geometry_type": "Triplane-transformer-sdf",
        "geometry": {
            "radius": 2.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
            "normal_type": "finite_difference",
            "space_generator_config": {
                "inner_dim": 32, "condition_dim": 24, "triplane_low_res": 4,
                "triplane_high_res": 8, "triplane_dim": 6, "num_layers": 2,
                "num_heads": 4, "local_text": False, "mlp_ratio": 2},
            "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 8,
                                   "n_hidden_layers": 2,
                                   "output_activation": "none"}},
        "material_type": "no-material",
        "material": {"color_activation": "sigmoid-mipnerf",
                     "requires_normal": True},
        "background_type": "neural-environment-map-background",
        "background": {"color_activation": "sigmoid-mipnerf",
                       "random_aug": False,
                       "dir_encoding_config": {
                           "otype": "HashGrid", "n_levels": 2,
                           "n_features_per_level": 2,
                           "log2_hashmap_size": 6, "base_resolution": 4,
                           "per_level_scale": 2.0},
                       "mlp_network_config": {
                           "otype": "VanillaMLP", "n_neurons": 8,
                           "n_hidden_layers": 1}},
        "renderer_type": "generative-space-volsdf-volume-renderer",
        "renderer": {"radius": 2.0, "use_volsdf": True,
                     "trainable_variance": False,
                     "learned_variance_init": 0.340119,
                     "estimator": "importance",
                     "num_samples_per_ray": 8,
                     "num_samples_per_ray_importance": 8,
                     "near_plane": 0.1, "far_plane": 4.0},
        "prompt_processor_type": "dummy-multi-prompt-processor",
        "prompt_processor": {
            "prompt_library": "lib", "prompt_library_dir": str(tmp),
            "use_local_text_embeddings": False,
            "cache_dir": str(tmp / "cache")},
        "guidance_type": "mvdream-asynchronous-score-distillation-guidance",
        "guidance": {
            "ckpt_path": None, "n_view": 4, "guidance_scale": 10.0,
            "plus_ratio": 0.1, "plus_random": True,
            "unet_block_channels": [32, 32, 32, 32],
            "vae_block_channels": [32, 32, 32, 32],
            "cross_attention_dim": 1024,
            "image_size": 64, "latent_size": 8},
        "loss": {"lambda_asd": 1.0, "lambda_sparsity": 1.0,
                 "lambda_eikonal": 0.01},
        "optimizer": {"name": "Adan",
                      "args": {"betas": [0.98, 0.92, 0.99], "eps": 1e-15},
                      "params": {"geometry": {"lr": 2e-4},
                                 "background": {"lr": 2e-4}}},
    }))
    return system, dm


def test_mvdream_triplane_train_steps(mv_system):
    import jax
    system, dm = mv_system
    rng = jax.random.PRNGKey(0)
    dm.setup("fit")
    system.on_fit_start(rng)
    # triplane conditions on the pooled embedding sliced to condition_dim
    orig_prepare = system.prepare_batch

    def prepare(batch):
        b = orig_prepare(batch)
        if "text_embed" in b and b["text_embed"].shape[-1] > 24:
            b = dict(b)
            b["text_embed"] = np.ascontiguousarray(b["text_embed"][..., :24])
        return b

    system.prepare_batch = prepare
    batch = system.prepare_batch(dm.train_batch())
    # views share a scene: 4 cameras per prompt, space cache repeats
    assert batch["rays_o"].shape[0] == 4
    assert batch["text_embed"].shape[0] == 1

    state = system.init_state(jax.random.fold_in(rng, 1), batch)
    step = system.make_train_step()
    gp = system.guidance_params
    losses = []
    for i in range(2):
        b = system.prepare_batch(dm.train_batch())
        jb = {k: v for k, v in b.items()
              if isinstance(v, (np.ndarray, jax.Array))}
        scalars = system.schedule_scalars(0, i)
        state, metrics = step(state, gp, jb, scalars,
                              jax.random.fold_in(rng, i))
        losses.append(float(np.asarray(metrics["loss"])))
    assert all(np.isfinite(l) for l in losses), losses
    # Adan optimizer actually moved the triplane generator
    leaf = jax.tree.leaves(state.params["geometry"])[0]
    assert np.isfinite(np.asarray(leaf)).all()
