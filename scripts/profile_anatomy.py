"""Step anatomy: time the train-step phases separately on the local chip.

Phases (each its own jitted program, timed with a scalar-readback anchor —
block_until_ready is a no-op on the axon relay):
  render_fwd   renderer forward only (sum of comp_rgb)
  render_grad  renderer forward+backward wrt params
  guide_fwd    guidance loss on a FIXED image (no render)
  guide_grad   guidance loss grad wrt the input image
  full_step    the real train step (render+guidance+Adam)

Uses the bench.py workload/config surface (BENCH_* env vars honored).
"""
import os
import sys
import time

os.environ.setdefault("SDTPU_BENCH", "1")
os.environ.setdefault("SDTPU_REMAT_RENDERER", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import contextlib
    cache_dir = os.environ.get("SDTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/sdtpu_xla"))
    with contextlib.suppress(Exception):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import scaledreamer_tpu as sd
    from scaledreamer_tpu.core.config import load_config, parse_structured
    sd.ensure_builtins()

    sys.path.insert(0, os.getcwd())
    import bench as benchmod  # reuse the exact bench override list

    # Rebuild the bench config by calling into bench's config block
    cfg = load_config(
        "configs/multi-prompt_benchmark/asd_sd_hyper_iNGP_50k.yaml",
        cli_args=[
            "system.prompt_processor.prompt_library=magic3d_15_prompt_library",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            "system.guidance.pretrained_model_name_or_path=__offline__",
            "use_timestamp=false", "tag=profile",
            "exp_root_dir=outputs/_bench", "trainer.max_steps=1",
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK", "0"),
            "system.geometry.normal_type="
            + os.environ.get("BENCH_NORMALS", "analytic"),
            "system.geometry.pos_encoding_config.interpolation="
            + os.environ.get("BENCH_INTERP", "Simplex"),
            "system.geometry.pos_encoding_config.dense_cell_packing="
            + os.environ.get("BENCH_PACKING", "true"),
        ] + ([
            "system.geometry.pos_encoding_config.n_levels=8",
            "system.geometry.pos_encoding_config.n_features_per_level=4",
            "system.geometry.pos_encoding_config.per_level_scale=2.2081413",
        ] if os.environ.get("BENCH_RESLICE", "1") == "1" else []),
        n_gpus=1)

    dm_cls = sd.find(cfg.data_type)
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, cfg.data), seed=0)
    system_cls = sd.find(cfg.system_type)
    system = system_cls(cfg=parse_structured(system_cls.Config, cfg.system))
    rng = jax.random.PRNGKey(0)
    dm.setup("fit")
    system.on_fit_start(rng)
    batch = system.prepare_batch(dm.train_batch())
    state = system.init_state(jax.random.fold_in(rng, 1), batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if isinstance(v, (np.ndarray, jax.Array))}
    scalars = {k: jnp.asarray(v)
               for k, v in system.schedule_scalars(0, 100).items()}
    renderer, guidance = system.renderer, system.guidance
    gp = system.guidance_params
    prompt_utils = system.build_prompt_utils(batch)
    kw = dict(system.render_kwargs(batch))

    def render_out(params, key):
        return renderer.apply(
            {"params": params}, jb["rays_o"], jb["rays_d"],
            light_positions=jb["light_positions"], train=True,
            rngs={"sampling": key, "aug": jax.random.fold_in(key, 1),
                  "noise": jax.random.fold_in(key, 2)}, **kw)

    @jax.jit
    def render_fwd(params, key):
        return jnp.sum(render_out(params, key)["comp_rgb"])

    @jax.jit
    def render_grad(params, key):
        def loss(p):
            return jnp.sum(render_out(p, key)["comp_rgb"] ** 2)
        return jax.value_and_grad(loss)(params)[0]

    fixed_img = jnp.asarray(np.random.default_rng(0).random(
        (jb["rays_o"].shape[0], 64, 64, 3), np.float32))

    def guide_loss(img, key):
        out = guidance(gp, key, img, prompt_utils,
                       elevation=jb["elevation"], azimuth=jb["azimuth"],
                       camera_distances=jb["camera_distances"],
                       min_step_percent=scalars["min_step_percent"],
                       max_step_percent=scalars["max_step_percent"],
                       grad_clip_val=scalars.get("grad_clip_val"))
        return out["loss_asd"]

    guide_fwd = jax.jit(lambda key: guide_loss(fixed_img, key))
    guide_grad = jax.jit(
        lambda key: jnp.sum(jax.grad(
            lambda im: guide_loss(im, key))(fixed_img)))

    train_step = system.make_train_step()

    def time_fn(name, fn, iters=6):
        out = fn(0)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(i + 1)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:14s} {dt*1e3:8.1f} ms")
        return dt

    key = jax.random.PRNGKey(7)
    time_fn("render_fwd", lambda i: render_fwd(
        state.params, jax.random.fold_in(key, i)))
    time_fn("render_grad", lambda i: render_grad(
        state.params, jax.random.fold_in(key, i)))
    time_fn("guide_fwd", lambda i: guide_fwd(jax.random.fold_in(key, i)))
    time_fn("guide_grad", lambda i: guide_grad(jax.random.fold_in(key, i)))
    sc_np = system.schedule_scalars(0, 100)
    st = state
    def full(i):
        nonlocal st
        st2, metrics = train_step(st, gp, jb, sc_np,
                                  jax.random.fold_in(key, i))
        st = st2
        return metrics["loss"]
    time_fn("full_step", full)


if __name__ == "__main__":
    main()
