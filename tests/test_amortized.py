"""Amortized path tests: Hyper-iNGP + generative renderer + multiprompt data."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.models.geometry.hyper_ingp import (LinearHyperNetwork,
                                                         hypernet_forward)

sd.ensure_builtins()

TINY_ENC = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 8, "base_resolution": 4,
            "per_level_scale": 1.5}


def test_linear_hypernetwork_shapes(jax_key):
    net = LinearHyperNetwork(n_input_dims=8, c_dim=16,
                             out_dims={"sdf_weights": [64, 1],
                                       "feature_weights": [64, 3]})
    text = jnp.ones((5, 16))
    params = net.init(jax_key, text)
    out = net.apply(params, text)
    assert [w.shape for w in out["sdf_weights"]] == [(5, 8, 64), (5, 64, 1)]
    assert [w.shape for w in out["feature_weights"]] == [(5, 8, 64), (5, 64, 3)]


def test_hypernet_forward_bmm():
    enc = jnp.ones((2, 7, 4))
    w1 = jnp.ones((2, 4, 3))
    w2 = jnp.ones((2, 3, 1))
    out = hypernet_forward(enc, [w1, w2])
    assert out.shape == (2, 7, 1)
    # relu(1*4)=4 each of 3 -> 12
    assert np.allclose(np.asarray(out), 12.0)


def _mk_hyper_ingp():
    Geo = sd.find("Hyper-iNGP")
    cfg = parse_structured(Geo.Config, {
        "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
        "normal_type": "finite_difference",
        "pos_encoding_config": TINY_ENC,
        "hypernet_config": {
            "c_dim": 12,
            "out_dims": {"sdf_weights": [16, 1], "feature_weights": [16, 3]},
            "spectral_norm": False, "n_neurons": 16, "n_hidden_layers": 1,
            "output_activation": None},
    })
    return Geo(cfg=cfg)


def test_hyper_ingp_space_cache_and_forward(jax_key):
    geo = _mk_hyper_ingp()
    text = jnp.ones((2, 12))
    pts = jax.random.uniform(jax_key, (2, 50, 3), minval=-1, maxval=1)

    params = geo.init(jax_key, pts, text, method=geo.init_all)
    cache = geo.apply(params, text_embed=text,
                      method=geo.generate_space_cache)
    assert cache["sdf_weights"][0].shape[0] == 2
    out = geo.apply(params, pts, cache, output_normal=True)
    assert out["sdf"].shape == (100, 1)
    assert out["features"].shape == (100, 3)
    assert out["normal"].shape == (100, 3)
    # sphere bias dominates at init: sdf ~ |p| - 0.5
    sdf = np.asarray(out["sdf"]).reshape(2, 50)
    expected = np.linalg.norm(np.asarray(pts), axis=-1) - 0.5
    assert np.abs(sdf - expected).mean() < 0.1


def test_hyper_ingp_different_prompts_different_fields(jax_key):
    geo = _mk_hyper_ingp()
    t1 = jax.random.normal(jax.random.PRNGKey(1), (1, 12))
    t2 = jax.random.normal(jax.random.PRNGKey(2), (1, 12))
    pts = jax.random.uniform(jax_key, (1, 20, 3), minval=-1, maxval=1)
    params = geo.init(jax_key, pts, t1, method=geo.init_all)
    c1 = geo.apply(params, text_embed=t1, method=geo.generate_space_cache)
    c2 = geo.apply(params, text_embed=t2, method=geo.generate_space_cache)
    f1 = geo.apply(params, pts, c1)["features"]
    f2 = geo.apply(params, pts, c2)["features"]
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


@pytest.fixture
def prompt_library(tmp_path):
    lib = {"train": ["a red apple", "a blue car", "a green tree"],
           "val": ["a red apple"], "test": ["a red apple", "a blue car"]}
    path = tmp_path / "lib"
    path.mkdir()
    with open(path / "tiny_library.json", "w") as f:
        json.dump(lib, f)
    return str(path)


def test_multiprompt_processor(prompt_library, tmp_path):
    P = sd.find("dummy-multi-prompt-processor")
    proc = P(cfg=parse_structured(P.Config, {
        "prompt_library": "tiny_library",
        "prompt_library_dir": prompt_library,
        "cache_dir": str(tmp_path / "cache"),
        "use_perp_neg": True}))
    out = proc(prompt=["a red apple", "a blue car"])
    assert out.text_embeddings_vd.shape == (2, 4, 77, 1024)
    assert out.global_text_embeddings.shape == (2, 1024)
    # batched selection works in traced context
    emb = out.get_text_embeddings(jnp.array([0.0, 0.0]),
                                  jnp.array([0.0, 100.0]), jnp.ones(2))
    assert emb.shape == (4, 77, 1024)
    # sample 0 front (idx1), sample 1 side (idx0) - per sample embeddings
    assert np.allclose(np.asarray(emb[0]),
                       np.asarray(out.text_embeddings_vd[0, 1]))
    assert np.allclose(np.asarray(emb[1]),
                       np.asarray(out.text_embeddings_vd[1, 0]))
    embpn, w = out.get_text_embeddings_perp_neg(
        jnp.array([0.0, 0.0]), jnp.array([0.0, 100.0]), jnp.ones(2))
    assert embpn.shape == (8, 77, 1024)
    assert w.shape == (2, 2)
    with pytest.raises(ValueError):
        proc(prompt=["not in library"])


def test_multiprompt_datamodule(prompt_library):
    DM = sd.find("multiprompt-camera-datamodule")
    dm = DM(cfg=parse_structured(DM.Config, {
        "batch_size": 2, "width": 8, "height": 8,
        "eval_height": 8, "eval_width": 8, "n_val_views": 2,
        "n_test_views": 3, "dim_gaussian": 16,
        "prompt_library": "tiny_library",
        "prompt_library_dir": prompt_library}), seed=0)
    dm.setup("fit")
    b = dm.train_batch()
    assert b["noise"].shape == (2, 16)
    assert len(b["prompt"]) == 2
    assert all(isinstance(p, str) for p in b["prompt"])
    dm.setup("test")
    batches = list(dm.test_dataset)
    assert len(batches) == 2 * 3  # 2 prompts x 3 views
    assert batches[0]["noise"].shape == (1, 16)


def test_generative_renderer_end_to_end(prompt_library, jax_key):
    Renderer = sd.find("generative-space-volsdf-volume-renderer")
    NoMaterial = sd.find("no-material")
    Bg = sd.find("multiprompt-neural-hashgrid-environment-map-background")
    geo = _mk_hyper_ingp()
    material = NoMaterial(cfg=parse_structured(NoMaterial.Config, {}))
    bg = Bg(cfg=parse_structured(Bg.Config, {
        "pos_encoding_config": TINY_ENC,
        "hypernet_config": {
            "c_dim": 12, "out_dims": {"bg_weights": [16, 3]},
            "spectral_norm": False, "n_neurons": 16, "n_hidden_layers": 1,
            "output_activation": None}}))
    cfg = parse_structured(Renderer.Config, {
        "radius": 1.0, "num_samples_per_ray": 16,
        "num_samples_per_ray_importance": 8, "use_volsdf": True,
        "learned_variance_init": float(np.log(30.0) / 10.0),
        "trainable_variance": False, "randomized": False})
    renderer = Renderer(cfg=cfg, geometry=geo, material=material,
                        background=bg)
    B, H, W = 2, 8, 8
    rays_o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (B, H, W, 3))
    # rays pointing roughly at origin
    rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, H, W, 3))
    text = jax.random.normal(jax_key, (B, 12))
    light = jnp.ones((B, 3))
    params = renderer.init(
        {"params": jax_key}, rays_o, rays_d, light_positions=light,
        text_embed=text, train=False)
    out = renderer.apply(params, rays_o, rays_d, light_positions=light,
                         text_embed=text, train=False)
    assert out["comp_rgb"].shape == (B, H, W, 3)
    assert out["opacity"].shape == (B, H, W, 1)
    # center rays hit the sphere-biased SDF
    assert float(out["opacity"][0, H // 2, W // 2, 0]) > 0.5
    # variance fixed (non-trainable): no params for it
    assert "variance" not in params["params"]

    # space-cache repeat: 1 prompt -> 2 views
    out2 = renderer.apply(params, rays_o, rays_d, light_positions=light,
                          text_embed=text[:1], train=False)
    assert out2["comp_rgb"].shape == (B, H, W, 3)


def test_generative_renderer_chunked_matches_unchunked(jax_key):
    NoMaterial = sd.find("no-material")
    Solid = sd.find("solid-color-background")
    material = NoMaterial(cfg=parse_structured(NoMaterial.Config, {}))
    bg = Solid(cfg=parse_structured(Solid.Config, {}))
    Renderer = sd.find("generative-space-volsdf-volume-renderer")
    geo = _mk_hyper_ingp()
    outs = {}
    for chunk in (0, 16):
        cfg = parse_structured(Renderer.Config, {
            "radius": 1.0, "num_samples_per_ray": 8,
            "num_samples_per_ray_importance": 8, "use_volsdf": True,
            "trainable_variance": False, "randomized": False,
            "train_chunk_size": chunk})
        r = Renderer(cfg=cfg, geometry=geo, material=material, background=bg)
        B, H, W = 2, 8, 8
        rays_o = jnp.broadcast_to(jnp.asarray([0., 0., 2.]), (B, H, W, 3))
        rays_d = jnp.broadcast_to(jnp.asarray([0., 0., -1.]), (B, H, W, 3))
        text = jax.random.normal(jax.random.PRNGKey(0), (B, 12))
        light = jnp.ones((B, 3))
        params = r.init({"params": jax.random.PRNGKey(1)}, rays_o, rays_d,
                        light_positions=light, text_embed=text, train=True)
        outs[chunk] = r.apply(
            params, rays_o, rays_d, light_positions=light, text_embed=text,
            train=True, rngs={"aug": jax.random.PRNGKey(3)})
    d = float(jnp.abs(outs[0]["comp_rgb"] - outs[16]["comp_rgb"]).max())
    assert d < 1e-4


def test_fixprompt_interpolation_dataset(prompt_library):
    """Reference Dataset4FixPrompt parity (multiprompt.py:125-163): zero
    noise, per-view interpolation ratio linspace(0,1), optional fixed
    camera."""
    DM = sd.find("multiprompt-camera-datamodule")
    dm = DM(cfg=parse_structured(DM.Config, {
        "batch_size": 1, "width": 8, "height": 8,
        "eval_height": 8, "eval_width": 8, "n_val_views": 4,
        "n_test_views": 3, "dim_gaussian": 16,
        "prompt_library": "tiny_library",
        "prompt_library_dir": prompt_library,
        "eval_prompt": "a red apple",
        "target_prompt": "a blue car",
        "eval_fix_camera": 1}), seed=0)
    dm.setup("validate")
    batches = list(dm.val_dataset)
    assert len(batches) == 4
    ratios = [float(b["ratio"]) for b in batches]
    assert ratios == pytest.approx([0.0, 1 / 3, 2 / 3, 1.0])
    for b in batches:
        assert np.allclose(b["noise"], 0.0)  # fixed-prompt eval: zero noise
        assert b["prompt"] == ["a red apple"]
        assert b["prompt_target"] == ["a blue car"]
    # fixed camera: identical rays across views
    assert np.allclose(batches[0]["rays_o"], batches[-1]["rays_o"])
    assert np.allclose(batches[0]["rays_d"], batches[-1]["rays_d"])


def test_amortized_prompt_interpolation_lerp(prompt_library, tmp_path):
    """The system lerps GLOBAL embeddings ratio*emb(prompt) +
    (1-ratio)*emb(target) (reference
    multiprompt_radience_field_generator.py:95-98)."""
    cls = sd.find("multiprompt-radience-field-generator-system")
    system = cls.__new__(cls)  # skip full configure; only prepare_batch
    P = sd.find("dummy-multi-prompt-processor")
    system.prompt_processor = P(cfg=parse_structured(P.Config, {
        "prompt_library": "tiny_library",
        "prompt_library_dir": prompt_library,
        "cache_dir": str(tmp_path / "cache")}))
    base = {"prompt": ["a red apple"], "elevation": np.zeros(1)}
    e_a = system.prepare_batch(dict(base))["text_embed"]
    e_b = system.prepare_batch(
        {"prompt": ["a blue car"]})["text_embed"]
    mid = system.prepare_batch(dict(
        base, prompt_target=["a blue car"], ratio=0.25))["text_embed"]
    assert np.allclose(mid, 0.25 * e_a + 0.75 * e_b, atol=1e-6)


def test_prop_encode_levels_render_close_to_parity(jax_key):
    """prop_encode_levels=k truncates the PROPOSAL encode only: the final
    render uses the full field, so images stay close to the parity render
    (only sample placement shifts) and opacity semantics hold."""
    Renderer = sd.find("generative-space-volsdf-volume-renderer")
    NoMaterial = sd.find("no-material")
    Solid = sd.find("solid-color-background")
    geo = _mk_hyper_ingp()
    material = NoMaterial(cfg=parse_structured(NoMaterial.Config, {}))
    bg = Solid(cfg=parse_structured(Solid.Config, {}))
    B, H, W = 1, 8, 8
    rays_o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (B, H, W, 3))
    rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, H, W, 3))
    text = jax.random.normal(jax_key, (B, 12))
    light = jnp.ones((B, 3))
    outs = {}
    for k in (0, 2):
        cfg = parse_structured(Renderer.Config, {
            "radius": 1.0, "num_samples_per_ray": 16,
            "num_samples_per_ray_importance": 8, "use_volsdf": True,
            "learned_variance_init": float(np.log(30.0) / 10.0),
            "trainable_variance": False, "randomized": False,
            "prop_encode_levels": k})
        renderer = Renderer(cfg=cfg, geometry=geo, material=material,
                            background=bg)
        params = renderer.init(
            {"params": jax_key}, rays_o, rays_d, light_positions=light,
            text_embed=text, train=False)
        outs[k] = renderer.apply(params, rays_o, rays_d,
                                 light_positions=light, text_embed=text,
                                 train=False)
    # same field, same params -> center opacity still saturates
    assert float(outs[2]["opacity"][0, H // 2, W // 2, 0]) > 0.5
    # proposal truncation only perturbs sample placement
    d = float(jnp.abs(outs[0]["comp_rgb"] - outs[2]["comp_rgb"]).max())
    assert np.isfinite(d) and d < 0.15, d

def test_multiprompt_packed_locals_match_eager(prompt_library, tmp_path,
                                               monkeypatch):
    """Corpus-scale locals: above _BIG_THRESHOLD every local embedding is
    served as a row view of ONE packed memmap (per-file mmaps hold an fd
    each — 86k files blew EMFILE at DL17k scale). The packed outputs must
    be bit-identical to the eager small-library path."""
    import scaledreamer_tpu as sd
    from scaledreamer_tpu.core.config import parse_structured

    sd.ensure_builtins()
    cls = sd.find("stable-diffusion-multi-prompt-processor")
    cfg = {
        "prompt_library": "tiny_library",
        "prompt_library_dir": prompt_library,
        "pretrained_model_name_or_path": "__offline__",
        "use_perp_neg": True,
        "cache_dir": str(tmp_path / "cache"),
    }
    eager = cls(cfg=parse_structured(cls.Config, cfg))
    prompts = eager.prompt_library["train"][:2]
    out_eager = eager(prompt=list(prompts))

    monkeypatch.setattr(cls, "_BIG_THRESHOLD", 1)
    packed = cls(cfg=parse_structured(cls.Config, cfg))
    assert isinstance(next(iter(packed.local_text_embeddings.values())),
                      np.memmap)
    assert hasattr(packed, "_local_pack")
    out_packed = packed(prompt=list(prompts))

    np.testing.assert_array_equal(np.asarray(out_eager.text_embeddings),
                                  np.asarray(out_packed.text_embeddings))
    np.testing.assert_array_equal(
        np.asarray(out_eager.text_embeddings_vd),
        np.asarray(out_packed.text_embeddings_vd))
    np.testing.assert_array_equal(
        np.asarray(out_eager.global_text_embeddings),
        np.asarray(out_packed.global_text_embeddings))

    # second construction reuses the pack (no rebuild)
    import os
    packs = [f for f in os.listdir(str(tmp_path / "cache"))
             if f.startswith("pack_") and f.endswith(".npy")]
    assert len(packs) == 1
    again = cls(cfg=parse_structured(cls.Config, cfg))
    assert again(prompt=list(prompts)) is not None
