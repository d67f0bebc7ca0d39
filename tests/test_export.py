"""Export path tests: marching tets, mesh ops, OBJ writer, full exporter."""

import os

import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.models.isosurface import (IsosurfaceHelper,
                                                marching_tetrahedra,
                                                marching_tetrahedra_numpy)
from scaledreamer_tpu.models.mesh import Mesh, write_obj

sd.ensure_builtins()


def _sphere_field(N=32, r=0.6):
    lin = np.linspace(-1, 1, N, dtype=np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r


def test_marching_tets_sphere():
    field = _sphere_field()
    verts, faces = marching_tetrahedra_numpy(field)
    assert len(verts) > 100 and len(faces) > 100
    assert faces.max() < len(verts)
    # vertices lie on the isosurface in grid coords: |p*2/(N-1)-1| ~ r
    N = 32
    world = verts * 2 / (N - 1) - 1
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - 0.6) < 0.02
    assert r.std() < 0.02


def test_native_matches_numpy():
    field = _sphere_field(24)
    v1, f1 = marching_tetrahedra_numpy(field)
    v2, f2 = marching_tetrahedra(field, prefer_native=True)
    assert len(v1) == len(v2)
    assert len(f1) == len(f2)
    assert np.allclose(np.sort(v1.ravel()), np.sort(v2.ravel()), atol=1e-4)


def test_empty_field():
    verts, faces = marching_tetrahedra_numpy(np.ones((8, 8, 8), np.float32))
    assert len(verts) == 0 and len(faces) == 0


def test_isosurface_helper_world_coords():
    helper = IsosurfaceHelper(resolution=24)
    pts = helper.grid_vertices([-2, -2, -2], [2, 2, 2])
    assert pts.shape == (24 ** 3, 3)
    field = np.linalg.norm(pts, axis=-1) - 1.0
    verts, faces = helper.extract(field, [-2, -2, -2], [2, 2, 2])
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 1.0) < 0.05


def test_mesh_normals_and_losses():
    field = _sphere_field(24)
    helper = IsosurfaceHelper(resolution=24)
    pts = helper.grid_vertices([-1, -1, -1], [1, 1, 1])
    verts, faces = helper.extract(
        np.linalg.norm(pts, axis=-1) - 0.6, [-1, -1, -1], [1, 1, 1])
    mesh = Mesh(verts, faces)
    n = mesh.v_normal
    assert n.shape == verts.shape
    # sphere normals point radially outward
    radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    cos = np.abs((n * radial).sum(-1))
    assert cos.mean() > 0.8  # MT at 24³ gives skinny tris
    assert mesh.laplacian() < 0.15         # smooth sphere
    assert mesh.normal_consistency() < 0.15


def test_obj_writer(tmp_path):
    mesh = Mesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
                np.array([[0, 1, 2]], np.int32))
    path = str(tmp_path / "m.obj")
    write_obj(path, mesh, v_rgb=np.ones((3, 3), np.float32) * 0.5)
    text = open(path).read()
    assert text.count("v ") == 3
    assert "f 1//1 2//2 3//3" in text


def test_remove_outliers():
    # two components: big triangle strip + one isolated triangle
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                  [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]], np.int32)
    mesh = Mesh(v, f)
    cleaned = mesh.remove_outliers(0.5)  # keep components >= 50% of faces
    assert cleaned.t_pos_idx.shape[0] == 2
    assert cleaned.v_pos.shape[0] == 4

def test_amortized_export_with_prompt(tmp_path):
    """--export on an amortized generator: a per-prompt space_cache is
    built from system.exporter.prompt (zero noise) and the isosurface of
    THAT prompt's field is exported. Beyond the reference, whose predict
    path cannot export its generators."""
    from types import SimpleNamespace

    import jax

    from scaledreamer_tpu.core.config import parse_structured
    from scaledreamer_tpu.models.exporters.mesh_exporter import run_export

    sd.ensure_builtins()
    tiny_enc = {"otype": "HashGrid", "n_levels": 4,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 1.5}
    system_cls = sd.find("multiprompt-radience-field-generator-system")
    system = system_cls(cfg=parse_structured(system_cls.Config, {
        "geometry_type": "Hyper-iNGP",
        "geometry": {
            "radius": 1.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
            "normal_type": "finite_difference",
            "isosurface_threshold": 0.0,
            "pos_encoding_config": tiny_enc,
            "hypernet_config": {
                "c_dim": 1024,  # dummy processor's real global-embed dim
                "out_dims": {"sdf_weights": [16, 1],
                             "feature_weights": [16, 3]},
                "spectral_norm": False, "n_neurons": 16,
                "n_hidden_layers": 1, "output_activation": None}},
        "material_type": "no-material",
        "material": {"requires_normal": True},
        "background_type": "solid-color-background",
        "background": {},
        "renderer_type": "generative-space-volsdf-volume-renderer",
        "renderer": {"radius": 1.0, "use_volsdf": True,
                     "trainable_variance": False,
                     "learned_variance_init": 0.340119,
                     "estimator": "importance",
                     "num_samples_per_ray": 8,
                     "num_samples_per_ray_importance": 8,
                     "near_plane": 0.1, "far_plane": 4.0},
        "guidance_type": "dummy-guidance",
        "guidance": {"target_color": [0.9, 0.1, 0.1]},
        "prompt_processor_type": "dummy-multi-prompt-processor",
        "prompt_processor": {
            "prompt_library": "magic3d_15_prompt_library",
            "prompt_library_dir": "load",
            "cache_dir": str(tmp_path / "cache")},
        "loss": {"lambda_asd": 1.0},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
    }))
    system.on_fit_start(jax.random.PRNGKey(0))

    dm_cls = sd.find("multiprompt-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": 1, "width": 8, "height": 8, "dim_gaussian": 16,
        "prompt_library": "magic3d_15_prompt_library",
        "prompt_library_dir": "load"}), seed=0)
    dm.setup("fit")
    state = system.init_state(jax.random.PRNGKey(0), dm.train_batch())

    cfg = SimpleNamespace(
        system={"exporter_type": "mesh-exporter",
                "exporter": {"prompt": "A ripe strawberry.",
                             "isosurface_resolution": 24,
                             "isosurface_coarse_to_fine": False}},
        data={"dim_gaussian": 16})
    files = run_export(system, state, cfg, str(tmp_path / "save"))
    obj = os.path.join(str(tmp_path / "save"), "export", "model.obj")
    assert os.path.exists(obj)
    n_verts = sum(1 for line in open(obj) if line.startswith("v "))
    assert n_verts > 50  # sphere sdf_bias guarantees a surface

    # without a prompt the amortized export must fail loudly
    cfg_bad = SimpleNamespace(
        system={"exporter_type": "mesh-exporter", "exporter": {}},
        data={"dim_gaussian": 16})
    with pytest.raises(ValueError, match="prompt"):
        run_export(system, state, cfg_bad, str(tmp_path / "save2"))
