"""Winding number / point-mesh distance / ShapeLoss tests
(reference threestudio/utils/ops.py:393-492, libigl-free)."""

import os

import jax.numpy as jnp
import numpy as np

from scaledreamer_tpu.models.isosurface import marching_tetrahedra_numpy
from scaledreamer_tpu.ops.shape_loss import (ShapeLoss, ce_pq_loss,
                                             point_mesh_sq_distance,
                                             read_obj, winding_number)


def _sphere_mesh(R=16, radius=0.5):
    ax = np.linspace(-1, 1, R, dtype=np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    field = np.linalg.norm(g, axis=-1) - radius
    verts, faces = marching_tetrahedra_numpy(field)
    verts = verts / (R - 1) * 2.0 - 1.0
    return verts.astype(np.float32), faces


def test_winding_number_inside_outside():
    v, f = _sphere_mesh()
    q = np.array([[0, 0, 0], [0.2, 0.1, -0.1],        # inside
                  [0.9, 0.9, 0.9], [0.8, 0, 0]],      # outside
                 np.float32)
    w = np.asarray(winding_number(v, f, q))
    assert w[0] > 0.9 and w[1] > 0.9
    assert abs(w[2]) < 0.1 and abs(w[3]) < 0.1


def test_point_mesh_distance_sphere():
    v, f = _sphere_mesh(24)
    q = np.array([[0, 0, 0], [0.9, 0, 0], [0, 0.7, 0]], np.float32)
    d = np.sqrt(np.asarray(point_mesh_sq_distance(v, f, q)))
    # distance to a radius-0.5 sphere surface
    np.testing.assert_allclose(d, [0.5, 0.4, 0.2], atol=0.06)


def test_ce_pq_loss_matches_reference_formula():
    p = jnp.asarray([0.2, 0.9])
    q = jnp.asarray([0.5, 0.5])
    got = float(ce_pq_loss(p, q))
    want = float(-(0.2 * np.log(0.5) + 0.8 * np.log(0.5))
                 - (0.9 * np.log(0.5) + 0.1 * np.log(0.5)))
    assert abs(got - want) < 1e-5


def test_shape_loss_prefers_matching_density(tmp_path):
    from scaledreamer_tpu.models.mesh import Mesh, write_obj
    v, f = _sphere_mesh()
    path = os.path.join(tmp_path, "guide.obj")
    write_obj(path, Mesh(v, f), save_normal=False)
    v2, f2 = read_obj(path)
    assert v2.shape == v.shape and f2.shape == f.shape

    sl = ShapeLoss(path, mesh_scale=0.7, proximal_surface=0.0)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    occ = np.asarray(winding_number(jnp.asarray(sl.verts),
                                    jnp.asarray(sl.faces), pts)) > 0.5
    # densities agreeing with occupancy -> smaller loss than disagreeing
    sig_good = jnp.asarray(np.where(occ, 50.0, 0.0).astype(np.float32))
    sig_bad = jnp.asarray(np.where(occ, 0.0, 50.0).astype(np.float32))
    assert float(sl(pts, sig_good)) < float(sl(pts, sig_bad))


def test_implicit_sdf_mesh_shape_target(tmp_path):
    """shape_init mesh:<path> target SDF: negative inside, ~radius-accurate."""
    from scaledreamer_tpu.models.geometry.implicit_sdf import \
        analytic_shape_sdf
    from scaledreamer_tpu.models.mesh import Mesh, write_obj
    v, f = _sphere_mesh(20)
    path = os.path.join(tmp_path, "guide.obj")
    write_obj(path, Mesh(v, f), save_normal=False)
    sdf_fn = analytic_shape_sdf(f"mesh:{path}", 0.7)
    q = jnp.asarray([[0.0, 0.0, 0.0], [0.95, 0.95, 0.95]])
    s = np.asarray(sdf_fn(q))[:, 0]
    assert s[0] < -0.3  # deep inside (normalized mesh radius 0.7)
    assert s[1] > 0.3   # far outside
