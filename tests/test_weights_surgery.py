"""Per-module weights surgery: `weights: path:module` loads only that
module's subtree (reference utils/base.py:103-112 + misc.py:33-63)."""

import os

import flax.serialization as ser
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured

sd.ensure_builtins()


def _tiny_system(weights=None):
    cls = sd.find("scaledreamer-system")
    return cls(cfg=parse_structured(cls.Config, {
        "geometry_type": "implicit-volume",
        "geometry": {
            "radius": 1.0, "normal_type": "analytic",
            "density_bias": "blob_magic3d",
            "density_activation": "softplus",
            "density_blob_scale": 10.0, "density_blob_std": 0.5,
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 1.5}},
        "material_type": "no-material",
        "material": {"color_activation": "sigmoid"},
        "background_type": "neural-environment-map-background",
        "renderer_type": "nerf-volume-renderer",
        "renderer": {"radius": 1.0, "num_samples_per_ray": 8,
                     "estimator": "importance",
                     "num_samples_per_ray_importance": 8},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        **({"weights": weights} if weights else {}),
    }))


def _batch():
    dm_cls = sd.find("random-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": 1, "width": 8, "height": 8}), seed=0)
    dm.setup("fit")
    return dm.train_batch()


def test_weights_module_surgery(tmp_path):
    batch = _batch()
    donor = _tiny_system()
    donor_state = donor.init_state(jax.random.PRNGKey(7), batch)
    ckpt = os.path.join(tmp_path, "donor.ckpt")
    with open(ckpt, "wb") as f:
        f.write(ser.to_bytes({"params": donor_state.params}))

    system = _tiny_system(weights=f"{ckpt}:geometry")
    state = system.init_state(jax.random.PRNGKey(123), batch)

    # geometry subtree == donor's, background != donor's (fresh init)
    d_geo = jax.tree_util.tree_leaves(donor_state.params["geometry"])
    n_geo = jax.tree_util.tree_leaves(state.params["geometry"])
    for a, b in zip(d_geo, n_geo):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    d_bg = jax.tree_util.tree_leaves(donor_state.params["background"])
    n_bg = jax.tree_util.tree_leaves(state.params["background"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(d_bg, n_bg))


def test_weights_module_surgery_unknown_module(tmp_path):
    batch = _batch()
    donor = _tiny_system()
    donor_state = donor.init_state(jax.random.PRNGKey(7), batch)
    ckpt = os.path.join(tmp_path, "donor.ckpt")
    with open(ckpt, "wb") as f:
        f.write(ser.to_bytes({"params": donor_state.params}))
    system = _tiny_system(weights=f"{ckpt}:nonexistent")
    with pytest.raises(KeyError, match="nonexistent"):
        system.init_state(jax.random.PRNGKey(0), batch)


def test_geometry_convert_inherit_texture_flag(tmp_path):
    """geometry_convert_from skips feature subtrees unless
    geometry_convert_inherit_texture (reference create_from copy_net)."""
    batch = _batch()
    donor = _tiny_system()
    donor_state = donor.init_state(jax.random.PRNGKey(3), batch)
    ckpt = os.path.join(tmp_path, "coarse.ckpt")
    with open(ckpt, "wb") as f:
        f.write(ser.to_bytes({"params": donor_state.params}))

    def build(inherit):
        cls = sd.find("scaledreamer-system")
        cfg = _tiny_system().cfg  # same arch -> all geometry keys match
        sys2 = cls(cfg=type(cfg)(**{
            **cfg.__dict__, "geometry_convert_from": ckpt,
            "geometry_convert_inherit_texture": inherit}))
        return sys2.init_state(jax.random.PRNGKey(99), batch)

    st_no = build(False)
    st_yes = build(True)
    d_feat = np.asarray(jax.tree_util.tree_leaves(
        donor_state.params["geometry"]["feature_network"])[0])
    no_feat = np.asarray(jax.tree_util.tree_leaves(
        st_no.params["geometry"]["feature_network"])[0])
    yes_feat = np.asarray(jax.tree_util.tree_leaves(
        st_yes.params["geometry"]["feature_network"])[0])
    assert not np.array_equal(no_feat, d_feat)   # fresh init
    assert np.array_equal(yes_feat, d_feat)      # inherited
    # non-feature geometry (encoding) copied in both cases
    d_enc = np.asarray(jax.tree_util.tree_leaves(
        donor_state.params["geometry"]["encoding"])[0])
    for st in (st_no, st_yes):
        got = np.asarray(jax.tree_util.tree_leaves(
            st.params["geometry"]["encoding"])[0])
        np.testing.assert_array_equal(got, d_enc)
