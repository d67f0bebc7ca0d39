"""Multi-chip data-parallel + ray-sharded eval tests on the 8-device CPU mesh.

Covers the reference's DP contract (SURVEY.md §2.2 row 1 — PL DDP: batch
split across ranks, params replicated, gradients allreduced) as a GSPMD
train step, plus the ray-axis shard_map eval path (SURVEY.md §5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.parallel import (data_sharding, make_data_mesh,
                                       replicated, shard_batch)

sd.ensure_builtins()

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    cpus = jax.devices("cpu")
    assert len(cpus) >= N_DEV, "conftest must force 8 CPU devices"
    return make_data_mesh(cpus[:N_DEV])


def _tiny_amortized_system():
    tiny_enc = {"otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4,
                "per_level_scale": 1.5}
    cls = sd.find("multiprompt-radience-field-generator-system")
    return cls(cfg=parse_structured(cls.Config, {
        "geometry_type": "Hyper-iNGP",
        "geometry": {
            "radius": 2.0, "sdf_bias": "sphere", "sdf_bias_params": 0.5,
            "normal_type": "analytic",
            "pos_encoding_config": tiny_enc,
            "hypernet_config": {
                "c_dim": 1024,
                "out_dims": {"sdf_weights": [16, 1],
                             "feature_weights": [16, 3]},
                "spectral_norm": False, "n_neurons": 16,
                "n_hidden_layers": 1, "output_activation": None}},
        "material_type": "no-material",
        "material": {"requires_normal": True},
        "background_type": "solid-color-background",
        "renderer_type": "generative-space-volsdf-volume-renderer",
        "renderer": {"radius": 2.0, "use_volsdf": True,
                     "trainable_variance": False,
                     "learned_variance_init": 0.340119,
                     "estimator": "importance",
                     "num_samples_per_ray": 6,
                     "num_samples_per_ray_importance": 6,
                     "near_plane": 0.1, "far_plane": 4.0},
        "guidance_type": "dummy-guidance",
        "guidance": {"target_color": (1.0, 0.2, 0.2)},
        "prompt_processor_type": "dummy-multi-prompt-processor",
        "prompt_processor": {
            "prompt_library": "magic3d_15_prompt_library",
            "prompt_library_dir": "load",
            "cache_dir": "/tmp/sdtpu_test_parallel_cache"},
        "loss": {"lambda_asd": 1.0, "lambda_sparsity": 1.0},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-2},
                      "params": {"geometry": {"lr": 1e-2}}},
    }))


def _batch(system, B, H=6, W=6):
    dm_cls = sd.find("multiprompt-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": B, "width": W, "height": H, "dim_gaussian": 8,
        "prompt_library": "magic3d_15_prompt_library",
        "prompt_library_dir": "load"}), seed=0)
    dm.setup("fit")
    return system.prepare_batch(dm.train_batch())


@pytest.fixture(scope="module")
def sharded_step(mesh):
    system = _tiny_amortized_system()
    rng = jax.random.PRNGKey(0)
    system.on_fit_start(rng)
    B = N_DEV
    batch = _batch(system, B)
    state = system.init_state(rng, batch)
    train_step = system.make_train_step(mesh=None)
    repl = replicated(mesh)
    state = jax.device_put(state, repl)
    gp = jax.device_put(system.guidance_params, repl)
    jb = shard_batch(mesh, batch, B)
    scalars = system.schedule_scalars(0, 0)
    new_state, metrics = train_step(state, gp, jb, scalars, rng)
    jax.block_until_ready(new_state.params)
    return system, state, new_state, metrics, jb, mesh


def test_batch_is_sharded_params_replicated(sharded_step):
    system, state, new_state, metrics, jb, mesh = sharded_step
    # batch arrays with leading dim B sharded over 'data'
    ro = jb["rays_o"]
    assert len(ro.sharding.device_set) == N_DEV
    shard_shapes = {s.data.shape for s in ro.addressable_shards}
    assert shard_shapes == {(1,) + ro.shape[1:]}
    # per-device batch shards genuinely differ (different cameras/prompts)
    shards = [np.asarray(s.data) for s in ro.addressable_shards]
    assert not np.allclose(shards[0], shards[1])
    # params replicated: every device holds the full array (use new_state —
    # the input state was donated to the jitted step)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert all(s.data.shape == leaf.shape for s in leaf.addressable_shards)


def test_sharded_step_finite_and_params_consistent(sharded_step):
    system, state, new_state, metrics, jb, mesh = sharded_step
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss)
    # post-step params identical across devices (gradient psum kept the
    # replicas in sync — the DDP allreduce contract)
    moved = 0.0
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        datas = [np.asarray(s.data) for s in leaf.addressable_shards]
        for d in datas[1:]:
            np.testing.assert_allclose(datas[0], d, rtol=0, atol=0)
        moved += float(np.abs(datas[0]).sum())
    assert moved > 0


def test_sharded_grads_average_matches_single_device(mesh):
    """The sharded step must compute the mean-over-global-batch gradient:
    a jitted sum-of-squares loss over a sharded batch equals the
    single-device result."""

    def loss_fn(w, x):
        return jnp.mean((x @ w) ** 2)

    w = jnp.ones((4, 2))
    x = np.random.default_rng(0).standard_normal((N_DEV * 2, 4)).astype(
        np.float32)
    g_single = jax.grad(loss_fn)(w, jnp.asarray(x))

    repl = replicated(mesh)
    data = data_sharding(mesh)
    w_r = jax.device_put(w, repl)
    x_s = jax.device_put(jnp.asarray(x), data)
    g_sharded = jax.jit(jax.grad(loss_fn))(w_r, x_s)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-6)


def test_system_eval_render_sharded_matches_host_chunked(mesh):
    """make_eval_render(mesh=...) (ray-axis shard_map, SURVEY §5) must
    reproduce the host-chunked single-device eval render."""
    cls = sd.find("scaledreamer-system")
    system = cls(cfg=parse_structured(cls.Config, {
        "geometry_type": "implicit-volume",
        "geometry": {
            "radius": 1.0, "density_bias": "blob_magic3d",
            "density_activation": "softplus",
            "density_blob_scale": 10.0, "density_blob_std": 0.5,
            "normal_type": "analytic",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 1.5}},
        "material_type": "no-material",
        "material": {"color_activation": "sigmoid"},
        "background_type": "solid-color-background",
        "renderer_type": "nerf-volume-renderer",
        "renderer": {"radius": 1.0, "num_samples_per_ray": 8,
                     "estimator": "importance",
                     "num_samples_per_ray_importance": 8},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
    }))
    dm_cls = sd.find("random-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": 1, "width": 12, "height": 12,
        "eval_width": 12, "eval_height": 12, "n_val_views": 1}), seed=0)
    dm.setup("validate")
    state = system.init_state(jax.random.PRNGKey(0),
                              next(iter(dm.val_dataset)))
    batch = next(iter(dm.val_dataset))
    ref = system.make_eval_render()(state.params, batch)
    shd = system.make_eval_render(mesh=mesh)(state.params, batch)
    for k in ref:
        np.testing.assert_allclose(np.asarray(shd[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-4)


def test_amortized_eval_render_sharded_matches_host_chunked(mesh):
    """Amortized make_eval_render(mesh=...): space_cache replicated, rays
    sharded — must match the host-chunked render."""
    system = _tiny_amortized_system()
    rng = jax.random.PRNGKey(0)
    system.on_fit_start(rng)
    batch = _batch(system, 1, H=10, W=10)
    state = system.init_state(rng, batch)
    ref = system.make_eval_render()(state.params, batch)
    shd = system.make_eval_render(mesh=mesh)(state.params, batch)
    for k in ref:
        # fp32 fusion/reduction-order noise across shard boundaries
        np.testing.assert_allclose(np.asarray(shd[k]), np.asarray(ref[k]),
                                   atol=1e-3, rtol=1e-3)


def test_ray_sharded_render_matches_unsharded(mesh):
    """shard_map over the ray axis gives bit-comparable results to the
    single-device render (rays are independent)."""
    from scaledreamer_tpu.parallel import ray_sharded_render

    def chunk_fn(params, rays_o, rays_d, extra):
        # a fake renderer: rgb from direction, depth from origin norm
        rgb = jnp.tanh(rays_d @ params["w"]) + extra["bias"]
        depth = jnp.linalg.norm(rays_o, axis=-1, keepdims=True)
        return {"comp_rgb": rgb, "depth": depth}

    rng = np.random.default_rng(1)
    N = 100  # deliberately NOT divisible by 8 -> exercises padding
    rays_o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    params = {"w": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))}
    extra = {"bias": jnp.float32(0.25)}

    expected = chunk_fn(params, rays_o, rays_d, extra)
    got = ray_sharded_render(mesh, chunk_fn, params, rays_o, rays_d, extra)
    for k in expected:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(expected[k]),
                                   rtol=1e-5, atol=1e-6)
        assert got[k].shape[0] == N


# ---------------------------------------------------------------- dp x tp
def test_tensor_parallel_unet_step_matches_dp():
    """Megatron-style 'model'-axis sharding of the frozen SD UNet/VAE
    (parallel/tensor.py): the full amortized train step on a (data=4,
    model=2) mesh must (a) actually shard attention/GEGLU kernels, and
    (b) reproduce the replicated-prior loss (GSPMD partitioning is
    math-preserving; only layout changes)."""
    import __graft_entry__ as ge
    from scaledreamer_tpu.parallel import (guidance_param_shardings,
                                           make_dp_tp_mesh,
                                           shard_guidance_params)

    cpus = jax.devices("cpu")
    assert len(cpus) >= 8
    system = ge._tiny_system()
    rng = jax.random.PRNGKey(0)
    system.on_fit_start(rng)
    B = 4
    batch = ge._tiny_batch(system, B=B)
    state = system.init_state(rng, batch)
    gp = system.guidance_params
    scalars = system.schedule_scalars(0, 0)
    train_step = system.make_train_step(mesh=None)

    # --- dp x tp mesh; reference run keeps the prior replicated on it
    # (the train step donates state, and device_put aliases identical
    # shardings — keep a host copy so each run gets fresh buffers)
    state_h = jax.tree.map(np.asarray, state)
    mesh2 = make_dp_tp_mesh(2, cpus[:8])
    repl2_ref = NamedSharding(mesh2, P())
    st_r = jax.device_put(state_h, repl2_ref)
    gp_r = jax.device_put(gp, repl2_ref)
    jb_r = {k: jax.device_put(np.asarray(v),
                              NamedSharding(mesh2, P("data"))
                              if np.asarray(v).shape[:1] == (B,)
                              else repl2_ref)
            for k, v in batch.items()
            if isinstance(v, (np.ndarray, jax.Array))}
    _, metrics_r = train_step(st_r, gp_r, jb_r, scalars, rng)
    loss_r = float(np.asarray(metrics_r["loss"]))

    # --- same mesh, UNet/VAE matmuls Megatron-sharded over 'model'
    shardings = guidance_param_shardings(gp, mesh2)
    n_model_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            jax.tree.map(lambda s: "model" in str(s.spec), shardings,
                         is_leaf=lambda x: isinstance(x, NamedSharding)))
        if s)
    assert n_model_sharded > 10, n_model_sharded  # kernels actually split
    gp_tp = shard_guidance_params(gp, mesh2)
    repl2 = NamedSharding(mesh2, P())
    st_tp = jax.device_put(state_h, repl2)
    jb_tp = {k: jax.device_put(np.asarray(v),
                               NamedSharding(mesh2, P("data"))
                               if np.asarray(v).shape[:1] == (B,) else repl2)
             for k, v in batch.items()
             if isinstance(v, (np.ndarray, jax.Array))}
    new_state, metrics_tp = train_step(st_tp, gp_tp, jb_tp, scalars, rng)
    jax.block_until_ready(new_state.params)
    loss_tp = float(np.asarray(metrics_tp["loss"]))
    assert np.isfinite(loss_tp)
    assert loss_tp == pytest.approx(loss_r, rel=2e-3), (loss_tp, loss_r)


def test_training_ray_sharding_single_prompt_matches_replicated():
    """shard_batch_rays: B=1 single-prompt TRAINING with pixel rows sharded
    over 'data' (plain GSPMD, no shard_map) reproduces the replicated-run
    loss — the TPU answer to the reference's one-GPU-per-prompt limit."""
    from scaledreamer_tpu.parallel import make_data_mesh, replicated
    from scaledreamer_tpu.parallel.rays import shard_batch_rays

    cpus = jax.devices("cpu")
    mesh = make_data_mesh(cpus[:8])
    system = _tiny_amortized_system()
    rng = jax.random.PRNGKey(0)
    system.on_fit_start(rng)
    batch = _batch(system, B=1, H=8, W=8)  # H divisible by 8 devices
    state = system.init_state(rng, batch)
    state_h = jax.tree.map(np.asarray, state)
    gp = system.guidance_params
    scalars = system.schedule_scalars(0, 0)
    train_step = system.make_train_step(mesh=None)
    repl = replicated(mesh)

    # replicated reference
    jb_r = {k: jax.device_put(np.asarray(v), repl) for k, v in batch.items()
            if isinstance(v, (np.ndarray, jax.Array))}
    _, m_r = train_step(jax.device_put(state_h, repl),
                        jax.device_put(gp, repl), jb_r, scalars, rng)
    loss_r = float(np.asarray(m_r["loss"]))

    # pixel rows sharded over 'data'
    jb_s = shard_batch_rays(mesh, batch)
    ro = jb_s["rays_o"]
    assert {s.data.shape for s in ro.addressable_shards} == \
        {(1, 1) + ro.shape[2:]}
    _, m_s = train_step(jax.device_put(state_h, repl),
                        jax.device_put(gp, repl), jb_s, scalars, rng)
    loss_s = float(np.asarray(m_s["loss"]))
    assert np.isfinite(loss_s)
    assert loss_s == pytest.approx(loss_r, rel=2e-3), (loss_s, loss_r)

def test_shard_batch_rays_warns_on_replication(caplog):
    """ADVICE r3: non-divisible ray rows must WARN when falling back to
    replication (zero ray parallelism), not proceed silently."""
    import logging

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from scaledreamer_tpu.parallel import rays as rays_mod
    from scaledreamer_tpu.parallel import shard_batch_rays

    rays_mod._REPLICATION_WARNED.clear()  # once-per-process flag
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))
    batch = {"rays_o": np.zeros((1, 7, 7, 3), np.float32),  # 7 % 8 != 0
             "rays_d": np.zeros((1, 7, 7, 3), np.float32)}
    with caplog.at_level(logging.WARNING,
                         logger="scaledreamer_tpu.parallel.rays"):
        out = shard_batch_rays(mesh, batch)
    assert "REPLICATED" in caplog.text
    assert out["rays_o"].shape == (1, 7, 7, 3)

    caplog.clear()
    batch_ok = {"rays_o": np.zeros((1, 8, 8, 3), np.float32),
                "rays_d": np.zeros((1, 8, 8, 3), np.float32)}
    with caplog.at_level(logging.WARNING,
                         logger="scaledreamer_tpu.parallel.rays"):
        shard_batch_rays(mesh, batch_ok)
    assert "REPLICATED" not in caplog.text
