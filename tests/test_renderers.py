"""Renderer tests: analytic sphere (SURVEY.md §4 build plan step 4)."""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.data.cameras import (get_ray_directions, get_rays,
                                           look_at_c2w)

sd.ensure_builtins()


class AnalyticSphereDensity(nn.Module):
    """Opaque sphere of radius 0.5 at origin (density field)."""
    radius: float = 0.5
    sigma: float = 1e3

    def __call__(self, points, output_normal=False):
        r = jnp.linalg.norm(points, axis=-1, keepdims=True)
        density = jnp.where(r < self.radius, self.sigma, 0.0)
        out = {"density": density,
               "features": jnp.broadcast_to(
                   jnp.asarray([10.0, -10.0, -10.0]),
                   (*points.shape[:-1], 3))}  # sigmoid -> red
        if output_normal:
            n = points / jnp.clip(r, 1e-6)
            out["normal"] = n
            out["shading_normal"] = n
        return out

    def forward_density(self, points):
        return self(points)["density"]


class AnalyticSphereSDF(nn.Module):
    radius: float = 0.5

    def __call__(self, points, output_normal=False):
        r = jnp.linalg.norm(points, axis=-1, keepdims=True)
        out = {"sdf": r - self.radius,
               "features": jnp.broadcast_to(
                   jnp.asarray([10.0, -10.0, -10.0]),
                   (*points.shape[:-1], 3))}
        if output_normal:
            n = points / jnp.clip(r, 1e-6)
            out.update({"normal": n, "shading_normal": n, "sdf_grad": n})
        return out

    def forward_sdf(self, points):
        return self(points)["sdf"]


def _camera_batch(H=16, W=16, dist=2.0):
    eye = np.array([[dist, 0.0, 0.0]], dtype=np.float32)
    c2w = look_at_c2w(eye, np.zeros((1, 3), np.float32),
                      np.array([[0, 0, 1]], np.float32))
    fovy = np.deg2rad(60.0)
    focal = 0.5 * H / np.tan(0.5 * fovy)
    dirs = get_ray_directions(H, W, focal=focal)
    rays_o, rays_d = get_rays(dirs[None], c2w, keepdim=True)
    return jnp.asarray(rays_o), jnp.asarray(rays_d)


def _build_material_background():
    NoMaterial = sd.find("no-material")
    material = NoMaterial(cfg=parse_structured(NoMaterial.Config, {}))
    Solid = sd.find("solid-color-background")
    background = Solid(cfg=parse_structured(
        Solid.Config, {"color": (0.0, 0.0, 1.0)}))
    return material, background


@pytest.mark.parametrize("estimator", ["importance", "occgrid"])
def test_nerf_renderer_sphere(estimator):
    Renderer = sd.find("nerf-volume-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "radius": 1.0, "num_samples_per_ray": 128, "estimator": estimator,
        "num_samples_per_ray_importance": 32, "randomized": False})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereDensity(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch()
    params = renderer.init(jax.random.PRNGKey(0), rays_o, rays_d, train=False)
    out = renderer.apply(params, rays_o, rays_d, train=False)
    H = rays_o.shape[1]
    c = H // 2
    opacity = np.asarray(out["opacity"])[0, ..., 0]
    assert opacity[c, c] > 0.95          # center hits the sphere
    assert opacity[0, 0] < 0.05          # corner misses
    depth = np.asarray(out["depth"])[0, c, c, 0]
    assert depth == pytest.approx(1.5, abs=0.05)   # 2.0 - 0.5
    rgb = np.asarray(out["comp_rgb"])[0]
    assert rgb[c, c, 0] > 0.9 and rgb[c, c, 2] < 0.1   # red sphere
    assert rgb[0, 0, 2] > 0.9                          # blue background


def test_neus_renderer_sphere_volsdf():
    Renderer = sd.find("neus-volume-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "radius": 1.0, "num_samples_per_ray": 64, "estimator": "importance",
        "num_samples_per_ray_importance": 64, "use_volsdf": True,
        "learned_variance_init": np.log(30.0) / 10.0, "randomized": False})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereSDF(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch()
    params = renderer.init(jax.random.PRNGKey(0), rays_o, rays_d, train=False)
    out = renderer.apply(params, rays_o, rays_d, train=False)
    H = rays_o.shape[1]
    c = H // 2
    opacity = np.asarray(out["opacity"])[0, ..., 0]
    assert opacity[c, c] > 0.9
    assert opacity[0, 0] < 0.1
    depth = np.asarray(out["depth"])[0, c, c, 0]
    assert depth == pytest.approx(1.5, abs=0.1)
    assert out["inv_std"] == pytest.approx(30.0, rel=1e-4)


def test_neus_renderer_train_outputs():
    Renderer = sd.find("neus-volume-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "num_samples_per_ray": 32, "estimator": "importance",
        "num_samples_per_ray_importance": 16, "use_volsdf": True})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereSDF(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch(H=8, W=8)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        rays_o, rays_d, train=True)
    out = renderer.apply(params, rays_o, rays_d, train=True,
                         rngs={"sampling": jax.random.PRNGKey(3),
                               "aug": jax.random.PRNGKey(4)})
    assert "weights" in out and "sdf" in out and "normal" in out
    assert out["z_variance"].shape == (1, 8, 8, 1)


def test_implicit_volume_geometry_forward(jax_key):
    Geo = sd.find("implicit-volume")
    cfg = parse_structured(Geo.Config, {
        "radius": 1.0, "normal_type": "analytic",
        "pos_encoding_config": {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 8, "base_resolution": 4,
            "per_level_scale": 1.5},
    })
    geo = Geo(cfg=cfg)
    pts = jax.random.uniform(jax_key, (33, 3), minval=-1, maxval=1)
    params = geo.init(jax_key, pts, output_normal=True)
    out = geo.apply(params, pts, output_normal=True)
    assert out["density"].shape == (33, 1)
    assert out["features"].shape == (33, 3)
    assert out["normal"].shape == (33, 3)
    norms = np.linalg.norm(np.asarray(out["normal"]), axis=-1)
    # normals are unit except where the density gradient vanishes
    assert (np.abs(norms - 1.0) < 1e-3).mean() > 0.8
    # magic3d blob: density at center >> density at edge
    d_center = geo.apply(params, jnp.zeros((1, 3)),
                         method=geo.forward_density)
    d_edge = geo.apply(params, jnp.full((1, 3), 0.9),
                       method=geo.forward_density)
    assert float(d_center[0, 0]) > float(d_edge[0, 0])


def test_implicit_sdf_geometry_sphere_bias(jax_key):
    Geo = sd.find("implicit-sdf")
    cfg = parse_structured(Geo.Config, {
        "sdf_bias": "sphere", "sdf_bias_params": 0.5,
        "normal_type": "finite_difference",
        "pos_encoding_config": {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 8, "base_resolution": 4,
            "per_level_scale": 1.5},
    })
    geo = Geo(cfg=cfg)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0]])
    params = geo.init(jax_key, pts, output_normal=True)
    sdf = np.asarray(geo.apply(params, pts, method=geo.forward_sdf))
    # hash features init ~1e-4, so sdf ~ |p| - 0.5
    assert sdf[0, 0] == pytest.approx(-0.5, abs=0.05)
    assert sdf[1, 0] == pytest.approx(0.4, abs=0.05)


def test_registered_names_present():
    for name in ["implicit-volume", "implicit-sdf", "no-material",
                 "neural-environment-map-background",
                 "solid-color-background", "textured-background",
                 "nerf-volume-renderer", "neus-volume-renderer",
                 "random-camera-datamodule"]:
        assert sd.find(name) is not None


def test_nerf_renderer_chunked_matches_unchunked():
    """train_chunk_size (lax.map over ray chunks) is numerically identical."""
    import jax
    Renderer = sd.find("nerf-volume-renderer")
    material, background = _build_material_background()
    outs = {}
    for chunk in (0, 64):
        cfg = parse_structured(Renderer.Config, {
            "radius": 1.0, "num_samples_per_ray": 32,
            "estimator": "importance",
            "num_samples_per_ray_importance": 16, "randomized": False,
            "train_chunk_size": chunk})
        renderer = Renderer(cfg=cfg, geometry=AnalyticSphereDensity(),
                            material=material, background=background)
        rays_o, rays_d = _camera_batch()
        params = renderer.init({"params": jax.random.PRNGKey(0)},
                               rays_o, rays_d, train=True)
        outs[chunk] = renderer.apply(
            params, rays_o, rays_d, train=True,
            rngs={"aug": jax.random.PRNGKey(2)})
    d = float(jnp.abs(outs[0]["comp_rgb"] - outs[64]["comp_rgb"]).max())
    assert d < 1e-5


def test_patch_renderer_train_and_eval():
    """patch-renderer parity (reference patch_renderer.py:15-106): train
    returns a FULL-res image (upsampled global pass with the random
    full-res patch spliced in); eval passes straight through."""
    Renderer = sd.find("patch-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "patch_size": 4, "global_downsample": 2, "radius": 1.0,
        "base_renderer_type": "nerf-volume-renderer",
        "base_renderer": {"radius": 1.0, "num_samples_per_ray": 16,
                          "estimator": "importance",
                          "num_samples_per_ray_importance": 8,
                          "randomized": False}})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereDensity(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch()
    B, H, W = rays_o.shape[:3]
    params = renderer.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, rays_o, rays_d, train=False)
    out_tr = renderer.apply(params, rays_o, rays_d, train=True,
                            rngs={"sampling": jax.random.PRNGKey(2)})
    assert out_tr["comp_rgb"].shape == (B, H, W, 3)
    assert np.isfinite(np.asarray(out_tr["comp_rgb"])).all()
    assert out_tr["opacity"].shape == (B, H, W, 1)
    out_ev = renderer.apply(params, rays_o, rays_d, train=False)
    assert out_ev["comp_rgb"].shape == (B, H, W, 3)
    # the eval path is the base renderer verbatim
    Base = sd.find("nerf-volume-renderer")
    base = Base(cfg=parse_structured(Base.Config, cfg.base_renderer),
                geometry=AnalyticSphereDensity(), material=material,
                background=background)
    bp = base.init(jax.random.PRNGKey(0), rays_o, rays_d, train=False)
    out_base = base.apply(bp, rays_o, rays_d, train=False)
    assert np.allclose(np.asarray(out_ev["comp_rgb"]),
                       np.asarray(out_base["comp_rgb"]), atol=1e-5)

def test_nerf_renderer_proposal_estimator():
    """Proposal estimator (reference nerf_volume_renderer.py:72-88,181-216):
    trainable prop net shapes the sample CDF; interlevel loss trains ONLY
    the prop_net subtree (the radiance field is detached in it)."""
    Renderer = sd.find("nerf-volume-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "radius": 1.0, "num_samples_per_ray": 64, "estimator": "proposal",
        "num_samples_per_ray_proposal": 32, "randomized": False,
        "proposal_network_config": {
            "n_input_dims": 3, "n_output_dims": 1,
            "encoding_config": {"otype": "HashGrid", "n_levels": 3,
                                "n_features_per_level": 2,
                                "log2_hashmap_size": 8,
                                "base_resolution": 4,
                                "per_level_scale": 1.5},
            "network_config": {"otype": "VanillaMLP", "n_neurons": 16,
                               "n_hidden_layers": 1}}})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereDensity(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch(H=8, W=8)
    variables = renderer.init(jax.random.PRNGKey(0), rays_o, rays_d,
                              train=True)
    assert "prop_net" in variables["params"], list(variables["params"])

    out = renderer.apply(variables, rays_o, rays_d, train=True,
                         rngs={"sampling": jax.random.PRNGKey(1)})
    assert "prop_loss" in out
    assert np.isfinite(float(out["prop_loss"]))
    # the render itself still sees the sphere
    opacity = np.asarray(out["opacity"])[0, ..., 0]
    assert opacity[4, 4] > 0.9 and opacity[0, 0] < 0.05

    def prop_loss_fn(params):
        o = renderer.apply({"params": params}, rays_o, rays_d, train=True,
                           rngs={"sampling": jax.random.PRNGKey(1)})
        return o["prop_loss"]

    grads = jax.grad(prop_loss_fn)(variables["params"])
    g_prop = sum(float(jnp.abs(g).sum())
                 for g in jax.tree.leaves(grads["prop_net"]))
    assert g_prop > 0.0, "interlevel loss must train the prop net"
    # everything outside prop_net is detached in the interlevel loss
    g_other = sum(float(jnp.abs(g).sum())
                  for k, sub in grads.items() if k != "prop_net"
                  for g in jax.tree.leaves(sub))
    assert g_other == 0.0, g_other

    # eval path: proposal sampling without the loss, finite render
    out_eval = renderer.apply(variables, rays_o, rays_d, train=False)
    assert "prop_loss" not in out_eval
    assert np.isfinite(np.asarray(out_eval["comp_rgb"])).all()


def test_nerf_renderer_unknown_estimator_raises():
    Renderer = sd.find("nerf-volume-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "radius": 1.0, "num_samples_per_ray": 16, "estimator": "nonsense"})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereDensity(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch(H=4, W=4)
    with pytest.raises(ValueError, match="Unknown estimator"):
        renderer.init(jax.random.PRNGKey(0), rays_o, rays_d, train=False)

def test_occgrid_levers_bounded_delta_on_trained_field(jax_key):
    """Quality guard for the bench-default occgrid speed levers (VERDICT
    r4 weak #4): `num_samples_compact` + `prop_encode_levels` move sample
    PLACEMENT only, so on an OPTIMIZED field (hashgrid fit to a sphere
    density for 300 steps — high-frequency content the analytic-sphere
    smoke can't expose) the levers-on render must stay within a tight
    delta of the full 128-sample render. Ref semantics being guarded:
    reference threestudio/models/renderers/nerf_volume_renderer.py:136-180
    (the full-eval path the compaction replaces)."""
    import optax

    Geo = sd.find("implicit-volume")
    gcfg = parse_structured(Geo.Config, {
        "radius": 1.0, "normal_type": "analytic",
        "pos_encoding_config": {
            "otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2,
            "log2_hashmap_size": 12, "base_resolution": 4,
            "per_level_scale": 1.45},
    })
    geo = Geo(cfg=gcfg)
    key = jax_key
    gvars = geo.init(key, jax.random.uniform(key, (256, 3),
                                             minval=-1, maxval=1))

    def target_sigma(p):  # soft-edged sphere, radius 0.45
        r = jnp.linalg.norm(p, axis=-1, keepdims=True)
        return 50.0 * jax.nn.sigmoid((0.45 - r) / 0.02)

    opt = optax.adam(5e-3)
    ostate = opt.init(gvars)

    @jax.jit
    def fit_step(gvars, ostate, k):
        pts = jax.random.uniform(k, (4096, 3), minval=-0.8, maxval=0.8)

        def loss_fn(v):
            d = geo.apply(v, pts, method=geo.forward_density)
            return jnp.mean(
                (jnp.log1p(d) - jnp.log1p(target_sigma(pts))) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(gvars)
        u, ostate2 = opt.update(g, ostate)
        return optax.apply_updates(gvars, u), ostate2, loss

    for i in range(300):
        key, k = jax.random.split(key)
        gvars, ostate, loss = fit_step(gvars, ostate, k)
    assert float(loss) < 0.05  # the field actually converged

    Renderer = sd.find("nerf-volume-renderer")
    material, background = _build_material_background()
    rays_o, rays_d = _camera_batch()
    outs = {}
    for name, levers in [("off", {}),
                         ("on", {"num_samples_compact": 32,
                                 "prop_encode_levels": 2})]:
        cfg = parse_structured(Renderer.Config, dict({
            "radius": 1.0, "num_samples_per_ray": 128,
            "estimator": "occgrid", "randomized": False}, **levers))
        r = Renderer(cfg=cfg, geometry=geo, material=material,
                     background=background)
        v = dict(r.init(jax.random.PRNGKey(1), rays_o, rays_d, train=True))
        p = dict(v["params"])
        p["geometry"] = gvars["params"]  # the SAME trained field
        v["params"] = p
        outs[name] = r.apply(v, rays_o, rays_d, train=True,
                             rngs={"sampling": jax.random.PRNGKey(2)})
    assert outs["on"]["weights"].shape[-2] == 32  # levers actually active
    H = rays_o.shape[1]
    c = H // 2
    for o in outs.values():  # both renders resolve the trained sphere
        op = np.asarray(o["opacity"]).reshape(H, H)
        assert op[c, c] > 0.95 and op[0, 0] < 0.05
    # bounded deltas: the levers buy speed, not blur (measured ~2e-3)
    d_rgb = float(jnp.abs(outs["off"]["comp_rgb"]
                          - outs["on"]["comp_rgb"]).max())
    assert d_rgb < 0.05, d_rgb
    d_op = float(jnp.abs(outs["off"]["opacity"] - outs["on"]["opacity"]).max())
    assert d_op < 0.05, d_op
    d_depth = abs(float(np.asarray(outs["off"]["depth"]).reshape(H, H)[c, c]
                        - np.asarray(outs["on"]["depth"]).reshape(H, H)[c, c]))
    assert d_depth < 0.02, d_depth


def test_nerf_renderer_occgrid_compaction():
    """Coarse-density sample compaction (num_samples_compact): train-time
    full-geometry evals shrink to the compact count while the render still
    resolves the sphere; eval path is untouched (full sample count)."""
    Renderer = sd.find("nerf-volume-renderer")
    material, background = _build_material_background()
    cfg = parse_structured(Renderer.Config, {
        "radius": 1.0, "num_samples_per_ray": 128, "estimator": "occgrid",
        "num_samples_compact": 32, "randomized": False})
    renderer = Renderer(cfg=cfg, geometry=AnalyticSphereDensity(),
                        material=material, background=background)
    rays_o, rays_d = _camera_batch()
    params = renderer.init(jax.random.PRNGKey(0), rays_o, rays_d, train=True)
    out = renderer.apply(params, rays_o, rays_d, train=True,
                         rngs={"sampling": jax.random.PRNGKey(1)})
    assert out["weights"].shape[-2] == 32  # compacted sample axis
    H = rays_o.shape[1]
    c = H // 2
    opacity = np.asarray(out["opacity"])[0, ..., 0].reshape(H, H)
    assert opacity[c, c] > 0.9 and opacity[0, 0] < 0.05
    depth = np.asarray(out["depth"]).reshape(H, H)[c, c]
    assert depth == pytest.approx(1.5, abs=0.07)
    # eval path keeps the full dense sample count
    out_eval = renderer.apply(params, rays_o, rays_d, train=False)
    assert np.asarray(out_eval["opacity"]).reshape(H, H)[c, c] > 0.9
