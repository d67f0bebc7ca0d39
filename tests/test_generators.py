"""Tests: 3DConv-net, Triplane-Transformer, multiview data, MVDream guidance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.models.geometry.conv3d_modules import (
    FullyConnectedLayer, MappingNetwork, modulated_conv3d)
from scaledreamer_tpu.models.geometry.triplane_transformer import (
    TriplaneTransformer, sample_from_planes)
from scaledreamer_tpu.models.guidance.mvdream_asd import normalize_camera
from scaledreamer_tpu.ops.grid_sample import (grid_sample_2d, grid_sample_3d,
                                              upsample_3d_align_corners)

sd.ensure_builtins()


# ------------------------------------------------------------- grid sample
def test_grid_sample_2d_center_and_corner():
    img = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # center of image with align_corners=False: avg of middle 4 pixels
    out = grid_sample_2d(img, jnp.zeros((1, 1, 2)))
    expected = (5 + 6 + 9 + 10) / 4
    assert float(out[0, 0, 0]) == pytest.approx(expected)
    # far outside -> zero padding
    out = grid_sample_2d(img, jnp.full((1, 1, 2), 3.0))
    assert float(out[0, 0, 0]) == 0.0


def test_grid_sample_3d_trilinear():
    vol = jnp.ones((1, 4, 4, 4, 2)) * 7.0
    out = grid_sample_3d(vol, jnp.zeros((1, 5, 3)))
    assert out.shape == (1, 5, 2)
    assert np.allclose(np.asarray(out), 7.0, atol=1e-5)


def test_upsample_3d_align_corners():
    x = jnp.arange(2.0).reshape(1, 2, 1, 1, 1)
    x = jnp.broadcast_to(x, (1, 2, 2, 2, 1))
    up = upsample_3d_align_corners(x, 2)
    assert up.shape == (1, 4, 4, 4, 1)
    # endpoints preserved (align_corners)
    assert float(up[0, 0, 0, 0, 0]) == 0.0
    assert float(up[0, 3, 0, 0, 0]) == 1.0


# ------------------------------------------------------------- 3dconv parts
def test_equalized_lr_dense(jax_key):
    layer = FullyConnectedLayer(features=8, activation="lrelu")
    x = jnp.ones((3, 4))
    params = layer.init(jax_key, x)
    y = layer.apply(params, x)
    assert y.shape == (3, 8)


def test_mapping_network_broadcast(jax_key):
    net = MappingNetwork(z_dim=16, c_dim=8, w_dim=32, num_ws=5, num_layers=2)
    z = jax.random.normal(jax_key, (2, 16))
    c = jnp.ones((2, 8))
    params = net.init(jax_key, z, c)
    ws = net.apply(params, z, c)
    assert ws.shape == (2, 5, 32)
    assert np.allclose(np.asarray(ws[:, 0]), np.asarray(ws[:, 1]))


def test_modulated_conv3d_demod(jax_key):
    x = jax.random.normal(jax_key, (2, 4, 4, 4, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 3, 3, 3))
    styles = jnp.ones((2, 3))
    out = modulated_conv3d(x, w, styles, padding=1)
    assert out.shape == (2, 4, 4, 4, 5)


def _tiny_conv3d_geometry():
    Geo = sd.find("3DConv-net")
    cfg = parse_structured(Geo.Config, {
        "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
        "normal_type": "finite_difference",
        "space_generator_config": {
            "z_dim": 8, "w_dim": 16, "c_dim": 12, "num_layers": 1,
            "img_resolution": 16, "img_channels": 4,
            # channel_base 16 -> genuinely tiny convs; the default 512
            # builds 512-channel conv3ds even at 16^3 (reference pyramid)
            "channel_base": 16, "channel_multiplier": 1},
        "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 8,
                               "n_hidden_layers": 1,
                               "output_activation": "none"},
    })
    return Geo(cfg=cfg)


def test_conv3d_net_end_to_end(jax_key):
    geo = _tiny_conv3d_geometry()
    z = jax.random.normal(jax_key, (2, 8))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 12))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 10, 3),
                             minval=-1, maxval=1)
    params = geo.init({"params": jax_key, "noise": jax.random.PRNGKey(3)},
                      pts, text, styles=z, method=geo.init_all)
    cache = geo.apply(params, styles=z, text_embed=text,
                      method=geo.generate_space_cache,
                      rngs={"noise": jax.random.PRNGKey(4)})
    assert cache["voxel"].shape == (2, 16, 16, 16, 4)
    assert cache["w"].shape[0] == 2  # pre-truncation w rides along for EMA
    out = geo.apply(params, pts, cache, output_normal=True)
    assert out["sdf"].shape == (20, 1)
    assert out["normal"].shape == (20, 3)
    # sphere bias contributes at init (generator output adds on top)
    sdf = np.asarray(out["sdf"]).reshape(2, 10)
    expected = np.linalg.norm(np.asarray(pts), axis=-1) - 0.5
    assert np.isfinite(sdf).all()
    assert np.corrcoef(sdf.ravel(), expected.ravel())[0, 1] > 0.0


def test_mapping_truncation_lerp(jax_key):
    """Truncation: w_trunc = w_avg + psi*(w - w_avg). The reference stubs
    this (stylegan_3dconv_modules.py:335-341 raises); completed here."""
    net = MappingNetwork(z_dim=16, c_dim=0, w_dim=32, num_ws=3, num_layers=2)
    z = jax.random.normal(jax_key, (2, 16))
    params = net.init(jax_key, z)
    # set a nonzero w_avg to see the lerp
    params = jax.tree.map(lambda x: x, params)
    params["params"]["w_avg"] = jnp.full((32,), 0.7)
    w1 = net.apply(params, z, truncation_psi=1.0)
    w0 = net.apply(params, z, truncation_psi=0.0)
    wh = net.apply(params, z, truncation_psi=0.5)
    assert np.allclose(np.asarray(w0), 0.7, atol=1e-6)  # psi=0 -> w_avg
    assert np.allclose(np.asarray(wh), 0.5 * (np.asarray(w1) + 0.7),
                       atol=1e-5)


def test_w_avg_ema_update_in_train_step_helper():
    from scaledreamer_tpu.systems.base import _apply_w_avg_ema
    params = {"geometry": {"space_generator": {"mapping": {
        "w_avg": jnp.zeros((4,)), "other": jnp.ones((2,))}}}}
    new = _apply_w_avg_ema(params, jnp.ones((4,)), beta=0.995)
    got = np.asarray(new["geometry"]["space_generator"]["mapping"]["w_avg"])
    assert np.allclose(got, 0.005)
    assert np.allclose(
        np.asarray(new["geometry"]["space_generator"]["mapping"]["other"]),
        1.0)


def test_fit_shape_init_3dconv_converges():
    """The 1000-step sphere pre-fit (reference stylegan_3dconv_net.py:
    122-198), shrunk to 60 steps on a tiny net: SDF MSE to the sphere
    must drop substantially."""
    from scaledreamer_tpu.models.geometry.stylegan_3dconv_net import \
        fit_shape_init_3dconv
    # img_resolution 8 (vs 16 elsewhere): the fused conv3d fwd+bwd+adam
    # program is the single most expensive XLA-CPU compile in the suite
    # (this box has ONE core); one fewer synthesis block halves it, and
    # convergence of the fit is resolution-independent.
    Geo = sd.find("3DConv-net")
    geo = Geo(cfg=parse_structured(Geo.Config, {
        "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
        "normal_type": "finite_difference",
        "space_generator_config": {
            "z_dim": 8, "w_dim": 16, "c_dim": 12, "num_layers": 1,
            "img_resolution": 8, "img_channels": 4,
            "channel_base": 16, "channel_multiplier": 1},
        "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 8,
                               "n_hidden_layers": 1,
                               "output_activation": "none"},
    }))
    # sphere shape-init without the closed-form bias
    object.__setattr__(geo.cfg, "sdf_bias", 0.0)
    object.__setattr__(geo.cfg, "shape_init", "sphere")
    object.__setattr__(geo.cfg, "shape_init_params", 0.5)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 12))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 256, 3),
                             minval=-1, maxval=1)
    variables = geo.init(
        {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
        pts, text, styles=z, method=geo.init_all)
    params = variables["params"]

    def mse(p):
        cache = geo.apply({"params": p}, styles=z, text_embed=None,
                          unconditional=True,
                          method=geo.generate_space_cache)
        sdf = geo.apply({"params": p}, pts, cache, method=geo.forward_sdf)
        gt = jnp.linalg.norm(pts, axis=-1, keepdims=True) - 0.5
        return float(jnp.mean((sdf - gt) ** 2))

    before = mse(params)
    fitted = fit_shape_init_3dconv(geo, params, n_steps=60, batch_size=2,
                                   n_points=256, lr=1e-2)
    after = mse(fitted)
    assert after < before * 0.5, (before, after)


# ------------------------------------------------------------- triplane
def test_sample_from_planes_layout():
    B, H, W, C = 1, 4, 4, 2
    planes = jnp.stack([jnp.full((B, H, W, C), i, jnp.float32)
                        for i in range(3)], axis=1)
    out = sample_from_planes(planes, jnp.zeros((B, 3, 3)))
    assert out.shape == (1, 3, 6)
    # concat order: plane0 feats, plane1 feats, plane2 feats
    assert np.allclose(np.asarray(out[0, 0]), [0, 0, 1, 1, 2, 2])


def test_triplane_transformer_shapes(jax_key):
    net = TriplaneTransformer(
        inner_dim=32, condition_dim=24, triplane_low_res=4,
        triplane_high_res=8, triplane_dim=6, num_layers=2, num_heads=4,
        local_text=True)
    text = jax.random.normal(jax_key, (2, 7, 24))
    params = net.init(jax_key, text)
    out = net.apply(params, text)
    assert out.shape == (2, 3, 8, 8, 6)


def test_triplane_geometry_end_to_end(jax_key):
    Geo = sd.find("Triplane-transformer-sdf")
    cfg = parse_structured(Geo.Config, {
        "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
        "normal_type": "finite_difference",
        "space_generator_config": {
            "inner_dim": 32, "condition_dim": 24, "triplane_low_res": 4,
            "triplane_high_res": 8, "triplane_dim": 6, "num_layers": 2,
            "num_heads": 4, "local_text": False, "mlp_ratio": 2},
        "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 8,
                               "n_hidden_layers": 2,
                               "output_activation": "none"},
    })
    geo = Geo(cfg=cfg)
    text = jax.random.normal(jax_key, (2, 24))  # global embedding variant
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 12, 3),
                             minval=-1, maxval=1)
    params = geo.init(jax_key, pts, text, method=geo.init_all)
    cache = geo.apply(params, text_embed=text,
                      method=geo.generate_space_cache)
    assert cache.shape == (2, 3, 8, 8, 6)
    out = geo.apply(params, pts, cache, output_normal=True)
    assert out["sdf"].shape == (24, 1)
    assert out["features"].shape == (24, 3)


# ------------------------------------------------------------- multiview
def test_multiview_datamodule_shared_scene_params():
    DM = sd.find("mvdream-random-multiview-camera-datamodule")
    dm = DM(cfg=parse_structured(DM.Config, {
        "batch_size": 8, "n_view": 4, "width": 8, "height": 8,
        "relative_radius": True}), seed=0)
    dm.setup("fit")
    b = dm.train_batch()
    assert b["rays_o"].shape == (8, 8, 8, 3)
    el = b["elevation"].reshape(2, 4)
    assert np.allclose(el, el[:, :1])  # shared per scene
    az = b["azimuth"].reshape(2, 4)
    # evenly spread: consecutive views differ by 360/4 = 90
    assert np.allclose(np.diff(az, axis=1), 90.0, atol=1e-4)
    d = b["camera_distances"].reshape(2, 4)
    assert np.allclose(d, d[:, :1])


def test_multiview_multiprompt_datamodule(tmp_path):
    import json
    lib = {"train": ["a", "b", "c"], "val": ["a"], "test": ["a"]}
    (tmp_path / "lib.json").write_text(json.dumps(lib))
    DM = sd.find("multiprompt-multiview-camera-datamodule")
    dm = DM(cfg=parse_structured(DM.Config, {
        "batch_size": 8, "n_view": 4, "width": 8, "height": 8,
        "dim_gaussian": 4, "prompt_library": "lib",
        "prompt_library_dir": str(tmp_path)}), seed=0)
    dm.setup("fit")
    b = dm.train_batch()
    assert len(b["prompt"]) == 2      # one prompt per scene
    assert b["noise"].shape == (2, 4)  # one noise per scene
    assert b["rays_o"].shape[0] == 8


# ------------------------------------------------------------- mvdream
def test_normalize_camera():
    c2w = jnp.eye(4)[None].at[:, :3, 3].set(jnp.array([[3.0, 4.0, 0.0]]))
    out = normalize_camera(c2w)
    assert out.shape == (1, 16)
    m = out.reshape(4, 4)
    assert float(jnp.linalg.norm(m[:3, 3])) == pytest.approx(1.0, abs=1e-5)


def test_mvdream_guidance_tiny(jax_key):
    G = sd.find("mvdream-asynchronous-score-distillation-guidance")
    g = G(cfg=parse_structured(G.Config, {
        "ckpt_path": None, "n_view": 4,
        "unet_block_channels": [32, 32, 32, 32],
        "vae_block_channels": [32, 32, 32, 32],
        "cross_attention_dim": 16, "image_size": 64, "latent_size": 8,
        "guidance_scale": 10.0, "plus_ratio": 0.1}))
    params = g.init_params(jax_key)

    from scaledreamer_tpu.models.prompt_processors.base import \
        PromptProcessorOutput
    rng = np.random.default_rng(0)
    vd = jnp.asarray(rng.standard_normal((4, 7, 16)).astype(np.float32))
    po = PromptProcessorOutput(
        text_embeddings=vd[0], uncond_text_embeddings=vd[1],
        text_embeddings_vd=vd, uncond_text_embeddings_vd=vd,
        use_perp_neg=False, perp_neg_f_sb=(1, 0.5, -0.606),
        perp_neg_f_fsb=(1, 0.5, 0.967), perp_neg_f_fs=(4, 0.5, -2.426),
        perp_neg_f_sf=(4, 0.5, -2.426), prompt="p", prompts_vd=[])

    B = 4
    # non-constant image: an exactly-constant input zeroes every VAE
    # activation and the chained GroupNorm backward gains overflow (same
    # degenerate behavior as the torch VAE)
    rgb = jax.random.uniform(jax.random.PRNGKey(7), (B, 16, 16, 3))
    c2w = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    elevation = jnp.zeros(B)
    azimuth = jnp.array([0.0, 90.0, 180.0, 270.0])

    def loss_fn(x):
        out = g(params, jax.random.PRNGKey(1), x, po, elevation, azimuth,
                jnp.ones(B), jnp.float32(0.02), jnp.float32(0.98), c2w=c2w)
        return out["loss_asd"]

    loss, grad = jax.value_and_grad(loss_fn)(rgb)
    assert np.isfinite(float(loss))
    assert np.abs(np.asarray(grad)).max() > 0

def test_mapping_conditional_requires_embedding(jax_key):
    """ADVICE r2: a text-conditioned mapping network must ERROR when the
    embedding is missing at normal call time (silent skip of the embed
    layer degrades training invisibly); the unconditional path is reserved
    for the shape-init pre-fit."""
    net = MappingNetwork(z_dim=8, c_dim=16, w_dim=32, num_ws=2, num_layers=2)
    z = jax.random.normal(jax_key, (2, 8))
    c = jax.random.normal(jax.random.fold_in(jax_key, 1), (2, 16))
    params = net.init(jax_key, z, c)
    # conditional forward works
    net.apply(params, z, c)
    # missing embedding without the explicit flag -> assertion
    with pytest.raises(AssertionError):
        net.apply(params, z, None)
    # the shape-init fit path is explicitly unconditional
    out = net.apply(params, z, None, unconditional=True)
    assert np.isfinite(np.asarray(out)).all()


def test_w_avg_frozen_under_weight_decay():
    """ADVICE r2: w_avg is an out-of-band EMA buffer stored in params; an
    unconditional AdamW/Adan weight decay must NOT decay it toward zero."""
    from scaledreamer_tpu.systems.optimizers import parse_optimizer
    params = {"geometry": {"mapping": {"w_avg": jnp.full((4,), 0.7),
                                       "kernel": jnp.ones((4, 4))}}}
    for opt_cfg in (
            {"name": "AdamW", "args": {"lr": 1e-2, "weight_decay": 0.1}},
            {"name": "AdamW", "args": {"lr": 1e-2, "weight_decay": 0.1},
             "params": {"geometry": {}}},
            {"name": "Adan", "args": {"lr": 1e-2, "weight_decay": 0.1}}):
        tx = parse_optimizer(opt_cfg, params)
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.zeros_like, params)
        p = params
        for _ in range(3):
            updates, opt_state = tx.update(grads, opt_state, p)
            import optax
            p = optax.apply_updates(p, updates)
        w_avg = np.asarray(p["geometry"]["mapping"]["w_avg"])
        assert np.allclose(w_avg, 0.7), (opt_cfg["name"], w_avg)
        # with zero grads + weight decay, the regular kernel DOES decay
        # (when its group is optimized), proving the transform is live
        if "params" not in opt_cfg and opt_cfg["name"] == "AdamW":
            k = np.asarray(p["geometry"]["mapping"]["kernel"])
            assert not np.allclose(k, 1.0)


def test_synthesis_channel_pyramid_reference_parity():
    """channel_base=512 (default) reproduces the reference channels_dict
    (stylegan_3dconv_modules.py:130-138) including channel_multiplier
    applying only above 16^3; smaller bases scale proportionally."""
    from scaledreamer_tpu.models.geometry.conv3d_modules import \
        SynthesisNetwork3D
    syn = SynthesisNetwork3D(w_dim=16, img_resolution=128, img_channels=32,
                             channel_multiplier=2)
    ref = {4: 512, 8: 512, 16: 512, 32: 256 * 2, 64: 128 * 2, 128: 64 * 2}
    for res, want in ref.items():
        assert syn._channels(res) == want, (res, syn._channels(res), want)
    tiny = SynthesisNetwork3D(w_dim=16, img_resolution=16, img_channels=4,
                              channel_base=16)
    assert [tiny._channels(r) for r in (4, 8, 16)] == [16, 16, 16]


def test_conv3d_bf16_compute_close_to_f32(jax_key):
    """space_generator_config.conv_dtype=bfloat16: conv compute drops to
    bf16 (MXU-native) while modulation/demod stay f32 — outputs must stay
    close to the f32 reference (mixed-precision contract)."""
    def build(dtype):
        Geo = sd.find("3DConv-net")
        return Geo(cfg=parse_structured(Geo.Config, {
            "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
            "normal_type": "finite_difference",
            "space_generator_config": {
                "z_dim": 8, "w_dim": 16, "c_dim": 12, "num_layers": 1,
                "img_resolution": 8, "img_channels": 4,
                "channel_base": 16, "channel_multiplier": 1,
                "conv_dtype": dtype},
            "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 8,
                                   "n_hidden_layers": 1,
                                   "output_activation": "none"},
        }))
    z = jax.random.normal(jax_key, (2, 8))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 12))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 3),
                             minval=-1, maxval=1)
    geo32 = build("float32")
    params = geo32.init(
        {"params": jax_key, "noise": jax.random.PRNGKey(3)},
        pts, text, styles=z, method=geo32.init_all)
    geo16 = build("bfloat16")
    outs = {}
    for name, geo in (("f32", geo32), ("bf16", geo16)):
        cache = geo.apply(params, styles=z, text_embed=text,
                          method=geo.generate_space_cache,
                          rngs={"noise": jax.random.PRNGKey(4)})
        assert cache["voxel"].dtype == jnp.float32  # cast back at the edges
        outs[name] = np.asarray(
            geo.apply(params, pts, cache)["sdf"])
    err = np.abs(outs["bf16"] - outs["f32"]).max()
    scale = np.abs(outs["f32"]).max() + 1e-6
    assert err / scale < 0.05, (err, scale)


def test_triplane_bf16_compute_close_to_f32(jax_key):
    """space_generator_config.dtype=bfloat16 runs the transformer's
    attention/MLP matmuls in bf16 (LayerNorms + params stay f32); outputs
    must stay close to the f32 reference."""
    def build(dtype):
        Geo = sd.find("Triplane-transformer-sdf")
        return Geo(cfg=parse_structured(Geo.Config, {
            "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
            "normal_type": "finite_difference",
            "space_generator_config": {
                "inner_dim": 32, "condition_dim": 24, "triplane_low_res": 4,
                "triplane_high_res": 8, "triplane_dim": 6, "num_layers": 2,
                "num_heads": 4, "local_text": False, "mlp_ratio": 2,
                "dtype": dtype},
            "mlp_network_config": {"otype": "VanillaMLP", "n_neurons": 8,
                                   "n_hidden_layers": 2,
                                   "output_activation": "none"},
        }))
    text = jax.random.normal(jax_key, (2, 24))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 3),
                             minval=-1, maxval=1)
    geo32 = build("float32")
    params = geo32.init(jax_key, pts, text, method=geo32.init_all)
    geo16 = build("bfloat16")
    outs = {}
    for name, geo in (("f32", geo32), ("bf16", geo16)):
        cache = geo.apply(params, text_embed=text,
                          method=geo.generate_space_cache)
        planes = jax.tree.leaves(cache)[0]
        assert planes.dtype == jnp.float32
        outs[name] = np.asarray(geo.apply(params, pts, cache)["sdf"])
    err = np.abs(outs["bf16"] - outs["f32"]).max()
    scale = np.abs(outs["f32"]).max() + 1e-6
    assert err / scale < 0.05, (err, scale)
