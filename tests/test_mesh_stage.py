"""Mesh-stage tests: in-graph marching tets, software rasterizer, and the
geometry-stage training path (reference scaledreamer.py:105-166)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.ops.marching_tets import (build_tet_topology,
                                                laplacian_loss,
                                                marching_tets,
                                                normal_consistency_loss)
from scaledreamer_tpu.ops.rasterize import interpolate, rasterize

sd.ensure_builtins()


def _sphere_mt(R=24, radius=0.6):
    topo = build_tet_topology(R)
    verts = jnp.asarray(topo.verts_unit) * 2.0 - 1.0  # [-1, 1]^3
    sdf = jnp.linalg.norm(verts, axis=-1) - radius
    return topo, verts, marching_tets(sdf, verts, topo)


def test_marching_tets_sphere_geometry():
    topo, verts, mt = _sphere_mt()
    v = np.asarray(mt.v_pos)[np.asarray(mt.v_valid)]
    assert v.shape[0] > 100
    r = np.linalg.norm(v, axis=-1)
    # vertices lie on the sphere within one cell diagonal
    cell = 2.0 / (topo.resolution - 1)
    assert np.abs(r - 0.6).max() < cell
    # valid faces reference only valid (crossing) vertices
    fv = np.asarray(mt.faces)[np.asarray(mt.face_valid)]
    assert np.asarray(mt.v_valid)[fv].all()


def test_marching_tets_normals_point_outward():
    _, _, mt = _sphere_mt()
    valid = np.asarray(mt.face_valid)
    n = np.asarray(mt.face_normal)[valid]
    f = np.asarray(mt.faces)[valid]
    centers = np.asarray(mt.v_pos)[f].mean(axis=1)
    outward = centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    cos = (n * outward).sum(-1)
    assert (cos > 0).mean() > 0.99  # winding rule orients away from inside


def test_marching_tets_differentiable_wrt_sdf():
    topo = build_tet_topology(8)
    verts = jnp.asarray(topo.verts_unit) * 2.0 - 1.0

    def mean_radius(radius):
        sdf = jnp.linalg.norm(verts, axis=-1) - radius
        mt = marching_tets(sdf, verts, topo)
        w = mt.v_valid.astype(jnp.float32)
        r = jnp.linalg.norm(mt.v_pos, axis=-1)
        return jnp.sum(r * w) / jnp.sum(w)

    g = jax.grad(mean_radius)(0.55)
    # growing the sphere moves iso-vertices outward
    assert np.isfinite(float(g)) and float(g) > 0.5


def test_mesh_regularizers_sphere_smoother_than_noisy():
    topo, verts, mt = _sphere_mt(16)
    nc_sphere = float(normal_consistency_loss(mt))
    lap_sphere = float(laplacian_loss(mt))
    # noisy field -> rough surface -> larger losses
    key = jax.random.PRNGKey(0)
    sdf = jnp.linalg.norm(verts, axis=-1) - 0.6 \
        + 0.15 * jax.random.normal(key, (verts.shape[0],))
    mt_noisy = marching_tets(sdf, verts, topo)
    assert float(normal_consistency_loss(mt_noisy)) > nc_sphere
    assert float(laplacian_loss(mt_noisy)) > lap_sphere
    assert nc_sphere < 0.1  # a sphere is smooth


def _simple_ortho_clip(v):
    """[V, 3] -> clip coords of a unit ortho camera looking down -z."""
    return jnp.concatenate(
        [v[:, :2], -v[:, 2:3], jnp.ones((v.shape[0], 1))], axis=-1)


def test_rasterize_single_triangle_coverage_and_depth():
    # big triangle covering the image center, at z = 0.5 (ndc -0.5 after
    # the -z flip)
    v = jnp.asarray([[-0.9, -0.9, -0.5], [0.9, -0.9, -0.5],
                     [0.0, 0.9, -0.5]])
    vc = _simple_ortho_clip(v)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    rast = rasterize(vc, faces, jnp.asarray([True]), 32, 32)
    m = np.asarray(rast.mask)
    assert m[16, 16]              # center covered
    assert not m[0, 0]            # corner outside
    # +y_ndc maps to increasing row (the framework camera convention,
    # cross-checked against the volume renderers): the apex (y=0.9) ends
    # near the BOTTOM, the wide base (y=-0.9) spans the top rows
    rows = np.nonzero(m.any(axis=1))[0]
    assert rows.min() <= 4 and rows.max() >= 26
    width_top = m[rows.min()].sum()
    width_bottom = m[rows.max()].sum()
    assert width_top > width_bottom  # base up, apex down
    z = np.asarray(rast.z)
    assert abs(z[16, 16] - 0.5) < 1e-5
    b = np.asarray(rast.bary)[16, 16]
    assert abs(b.sum() - 1.0) < 1e-5


def test_rasterize_depth_test_picks_nearer_triangle():
    v = jnp.asarray([
        [-1.0, -1.0, -0.2], [1.0, -1.0, -0.2], [0.0, 1.0, -0.2],  # near
        [-1.0, -1.0, -0.8], [1.0, -1.0, -0.8], [0.0, 1.0, -0.8],  # far
    ])
    vc = _simple_ortho_clip(v)
    faces = jnp.asarray([[3, 4, 5], [0, 1, 2]], jnp.int32)
    rast = rasterize(vc, faces, jnp.asarray([True, True]), 16, 16)
    assert int(rast.tri_id[8, 8]) == 1  # the nearer (z=0.2) triangle wins


def test_rasterize_interpolate_gradients_flow_to_vertices():
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.eye(3)

    def mean_red(dz):
        v = jnp.asarray([[-0.9, -0.9, -0.5], [0.9, -0.9, -0.5],
                         [0.0, 0.9, -0.5]]) + dz
        rast = rasterize(_simple_ortho_clip(v), faces,
                         jnp.asarray([True]), 16, 16)
        img = interpolate(colors, rast, faces)
        return jnp.mean(img[..., 0])

    g = jax.grad(mean_red)(jnp.zeros(3))
    assert np.abs(np.asarray(g)).max() > 0  # bary gradient reaches verts


@pytest.fixture(scope="module")
def geometry_stage_system(tmp_path_factory):
    cls = sd.find("scaledreamer-system")
    system = cls(cfg=parse_structured(cls.Config, {
        "stage": "geometry",
        "geometry_type": "implicit-sdf",
        "geometry": {
            "radius": 1.0, "shape_init": "sphere",
            "shape_init_params": 0.5, "normal_type": "analytic",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 1.5}},
        "material_type": "no-material",
        "material": {"requires_normal": True},
        "background_type": "solid-color-background",
        "renderer_type": "mesh-rasterize-renderer",
        "renderer": {"radius": 1.0, "isosurface_resolution": 12,
                     "render_rgb": False, "rasterize_chunk": 512},
        "guidance_type": "dummy-guidance",
        "guidance": {"target_color": (0.2, 0.8, 0.2)},
        "prompt_processor_type": "dummy-prompt-processor",
        "prompt_processor": {
            "prompt": "a sphere",
            "cache_dir": str(tmp_path_factory.mktemp("ppcache"))},
        "loss": {"lambda_asd": 1.0, "lambda_normal_consistency": 100.0,
                 "lambda_laplacian_smoothness": 10.0},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3},
                      "params": {"geometry": {"lr": 1e-3}}},
    }))
    return system


def _camera_batch(B=1, H=16, W=16):
    dm_cls = sd.find("random-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": B, "width": W, "height": H}), seed=0)
    dm.setup("fit")
    return dm.train_batch()


def test_mesh_render_orientation_matches_volume(tmp_path):
    """Regression: the software rasterizer must agree with the volume
    renderers on image orientation (caught a vertical flip in r2). An SDF
    pre-fit to an OFF-CENTER sphere is rendered by both paths with the
    same camera; mask centroids must coincide."""
    import optax

    def build(renderer_type, renderer_cfg):
        cls = sd.find("scaledreamer-system")
        return cls(cfg=parse_structured(cls.Config, {
            "geometry_type": "implicit-sdf",
            "geometry": {
                "radius": 1.0, "shape_init": "sphere",
                "shape_init_params": 0.35, "normal_type": "analytic",
                "pos_encoding_config": {
                    "otype": "HashGrid", "n_levels": 4,
                    "n_features_per_level": 2, "log2_hashmap_size": 8,
                    "base_resolution": 4, "per_level_scale": 1.5}},
            "material_type": "no-material",
            "material": {"requires_normal": True},
            "background_type": "solid-color-background",
            "renderer_type": renderer_type, "renderer": renderer_cfg,
            "guidance_type": "dummy-guidance", "guidance": {},
            "prompt_processor_type": "dummy-prompt-processor",
            "prompt_processor": {"prompt": "x",
                                 "cache_dir": str(tmp_path / "pp")},
            "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        }))

    dm_cls = sd.find("random-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": 1, "width": 24, "height": 24,
        "elevation_range": [25, 25], "azimuth_range": [0, 0],
        "camera_distance_range": [1.8, 1.8],
        "fovy_range": [60, 60]}), seed=0)
    dm.setup("fit")
    batch = dm.train_batch()

    sys_vol = build("neus-volume-renderer",
                    {"radius": 1.0, "num_samples_per_ray": 32,
                     "use_volsdf": True, "trainable_variance": False,
                     "learned_variance_init": 0.35,
                     "estimator": "importance",
                     "num_samples_per_ray_importance": 16})
    state = sys_vol.init_state(jax.random.PRNGKey(0), batch)
    geo = sys_vol.geometry

    # fit the SDF to a sphere shifted UP (+z world)
    tx = optax.adam(5e-3)
    gp = {"params": state.params["geometry"]}
    opt = tx.init(gp)
    center = jnp.asarray([0.0, 0.0, 0.45])

    @jax.jit
    def fit(gp, opt, k):
        pts = jax.random.uniform(k, (2048, 3), minval=-1, maxval=1)

        def loss(p):
            sdf = geo.apply(p, pts, method=geo.forward_sdf)
            gt = jnp.linalg.norm(pts - center, axis=-1,
                                 keepdims=True) - 0.3
            return jnp.mean((sdf - gt) ** 2)

        l, g = jax.value_and_grad(loss)(gp)
        u, opt = tx.update(g, opt, gp)
        return optax.apply_updates(gp, u), opt, l

    for i in range(200):
        gp, opt, _ = fit(gp, opt, jax.random.PRNGKey(i))
    params = dict(state.params)
    params["geometry"] = gp["params"]

    out_v = sys_vol.renderer.apply(
        {"params": params}, jnp.asarray(batch["rays_o"]),
        jnp.asarray(batch["rays_d"]),
        light_positions=jnp.asarray(batch["light_positions"]), train=False)
    mask_v = np.asarray(out_v["opacity"])[0, :, :, 0] > 0.5

    sys_mesh = build("mesh-rasterize-renderer",
                     {"radius": 1.0, "isosurface_resolution": 20,
                      "render_rgb": False, "rasterize_chunk": 512})
    out_m = sys_mesh.renderer.apply(
        {"params": params}, jnp.asarray(batch["rays_o"]),
        jnp.asarray(batch["rays_d"]),
        light_positions=jnp.asarray(batch["light_positions"]),
        mvp_mtx=jnp.asarray(batch["mvp_mtx"]),
        camera_positions=jnp.asarray(batch["camera_positions"]),
        train=False)
    mask_m = np.asarray(out_m["opacity"])[0, :, :, 0] > 0.5

    assert mask_v.sum() > 20 and mask_m.sum() > 20

    def centroid(m):
        ys, xs = np.nonzero(m)
        return np.array([ys.mean(), xs.mean()])

    delta = np.abs(centroid(mask_v) - centroid(mask_m))
    assert (delta < 3.0).all(), (centroid(mask_v), centroid(mask_m))


def test_texture_stage_train_step(tmp_path):
    """stage=texture: mesh render with rgb, guidance on comp_rgb, material
    MLP trains while geometry stays frozen (reference scaledreamer.py:162,
    texture-stage param groups)."""
    cls = sd.find("scaledreamer-system")
    system = cls(cfg=parse_structured(cls.Config, {
        "stage": "texture",
        "geometry_type": "implicit-sdf",
        "geometry": {
            "radius": 1.0, "shape_init": "sphere",
            "shape_init_params": 0.5, "normal_type": "analytic",
            "n_feature_dims": 8,
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 1.5}},
        "material_type": "no-material",
        "material": {"requires_normal": False, "n_output_dims": 3,
                     "input_feature_dims": 8,
                     "color_activation": "sigmoid",
                     "mlp_network_config": {
                         "otype": "VanillaMLP", "n_neurons": 16,
                         "n_hidden_layers": 1,
                         "output_activation": "none"}},
        "background_type": "solid-color-background",
        "renderer_type": "mesh-rasterize-renderer",
        "renderer": {"radius": 1.0, "isosurface_resolution": 10,
                     "render_rgb": True, "rasterize_chunk": 512},
        "guidance_type": "dummy-guidance",
        "guidance": {"target_color": (0.9, 0.2, 0.1)},
        "prompt_processor_type": "dummy-prompt-processor",
        "prompt_processor": {"prompt": "a sphere",
                             "cache_dir": str(tmp_path / "pp")},
        "loss": {"lambda_asd": 1.0},
        # texture stage: only the material is optimized
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2},
                      "params": {"material": {"lr": 1e-2}}},
    }))
    rng = jax.random.PRNGKey(0)
    system.on_fit_start(rng)
    batch = system.prepare_batch(_camera_batch())
    state = system.init_state(rng, batch)
    step = system.make_train_step()
    jb = {k: v for k, v in batch.items()
          if isinstance(v, (np.ndarray, jax.Array))}
    old_geo = jax.tree.map(np.asarray, state.params["geometry"])
    old_mat = jax.tree.map(np.asarray, state.params["material"])
    new_state, metrics = step(state, system.guidance_params, jb,
                              system.schedule_scalars(0, 0), rng)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    geo_moved = sum(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).sum()),
        old_geo, new_state.params["geometry"])))
    mat_moved = sum(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - np.asarray(b)).sum()),
        old_mat, new_state.params["material"])))
    assert geo_moved == 0.0  # frozen
    assert mat_moved > 0.0   # trains


def test_geometry_stage_train_step(geometry_stage_system):
    system = geometry_stage_system
    rng = jax.random.PRNGKey(0)
    system.on_fit_start(rng)
    batch = system.prepare_batch(_camera_batch())
    state = system.init_state(rng, batch)
    step = system.make_train_step()
    scalars = system.schedule_scalars(0, 0)
    jb = {k: v for k, v in batch.items()
          if isinstance(v, (np.ndarray, jax.Array))}
    old_geo = jax.tree.map(np.asarray, state.params["geometry"])
    new_state, metrics = step(state, system.guidance_params, jb, scalars,
                              rng)
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    # mesh regularizers flow into the loss
    assert "loss_normal_consistency" in metrics
    assert float(np.asarray(metrics["loss_normal_consistency"])) > 0
    # geometry params actually moved
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - np.asarray(b)).sum()),
                         old_geo, new_state.params["geometry"])
    assert sum(jax.tree_util.tree_leaves(diffs)) > 0


def test_mesh_renderer_system_forces_x_grad(geometry_stage_system):
    """ADVICE r2 (medium): mesh rasterization feeds differentiable pixel
    positions (functions of the SDF params via marching-tets vertices) into
    the geometry; the system must force compute_x_grad=True on the hash
    encoding whenever the geometry trains under a mesh renderer, else the
    image-guidance gradient to vertex positions is silently zeroed."""
    system = geometry_stage_system
    pec = system.geometry.cfg.pos_encoding_config
    assert pec.get("compute_x_grad") is True
    # the flag flows through to the built encoding config
    from scaledreamer_tpu.ops.hashgrid import hashgrid_config_from_tcnn
    assert hashgrid_config_from_tcnn(pec).compute_x_grad
    # texture stage (frozen geometry) keeps the cheap default
    cls = sd.find("scaledreamer-system")
    cfg_dict = {
        "stage": "texture",
        "geometry_type": "implicit-sdf",
        "geometry": {"radius": 1.0},
        "material_type": "no-material",
        "background_type": "solid-color-background",
        "renderer_type": "mesh-rasterize-renderer",
        "renderer": {"radius": 1.0, "isosurface_resolution": 8},
        "guidance_type": "dummy-guidance",
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
    }
    tex_system = cls(cfg=parse_structured(cls.Config, cfg_dict))
    tex_pec = tex_system.geometry.cfg.pos_encoding_config
    assert not tex_pec.get("compute_x_grad", False)
