"""Measure it/s for every BASELINE.md workload row on the local chip.

Runs each reference benchmark workload (configs/*-prompt_benchmark/*.yaml)
for a few honest steps (per-step scalar readback; the axon relay's
block_until_ready returns early) and prints one JSON line per row.

Usage: python scripts/bench_workloads.py [row ...]
Rows: sd_nerf sd_nerf_256 mv_nerf hyper_ingp conv3d conv3d_300k triplane
(default: all, never-measured rows first), plus eval_512 (512² eval-render
rays/sec through make_eval_render; not in the default set).

Resumable: each finished row is written to $BENCH_RESULTS/<row>.json
(default outputs/_bench_rows). With BENCH_RESUME=1 rows that already have
a result file are skipped, so a timed-out queue can be relaunched without
re-burning chip time on the rows that finished (VERDICT r4 #3).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SDTPU_BENCH", "1")
os.environ.setdefault("SDTPU_REMAT_RENDERER", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFLINE = [
    "use_timestamp=false", "exp_root_dir=outputs/_bench",
    "trainer.max_steps=1",
]
# SD guidance takes pretrained_model_name_or_path; MVDream takes ckpt_path
# (missing path -> random init, same compute as pretrained)
SD_OFFLINE = ["system.guidance.pretrained_model_name_or_path=__offline__"]

# TPU-first 8x4 table re-slice (see bench.py): identical param count
# (8*2^19*4 == 16*2^19*2), output width (32) and finest resolution (4096,
# per_level_scale = exp(ln(256)/7)) as the tcnn 16x2 slicing; gather and
# scatter cost are per ROW and width-independent on this stack (memory
# axon-tpu-measurement), so halving the level count halves the encode
# rows. BENCH_RESLICE=0 restores the tcnn 16x2 parity slicing. All the
# implicit-volume and Hyper-iNGP rows share these exact constants.
_RESLICE = ([
    "system.geometry.pos_encoding_config.n_levels=8",
    "system.geometry.pos_encoding_config.n_features_per_level=4",
    "system.geometry.pos_encoding_config.per_level_scale=2.2081413",
] if os.environ.get("BENCH_RESLICE", "1") == "1" else [])

WORKLOADS = {
    # single-prompt ASD-SD NeRF (64² stage; 512 samples/ray occgrid)
    "sd_nerf": dict(
        config="configs/single-prompt_benchmark/asd_sd_nerf.yaml",
        overrides=OFFLINE + SD_OFFLINE + [
            "tag=bench_sd_nerf",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            'system.prompt_processor.prompt="a benchmark object"',
            # TPU-first encode options (measured-best, same set as the
            # other rows; BENCH_NORMALS=finite_difference
            # BENCH_INTERP=Linear BENCH_PACKING=false for parity options)
            "system.geometry.normal_type="
            + os.environ.get("BENCH_NORMALS", "analytic"),
            "system.geometry.pos_encoding_config.interpolation="
            + os.environ.get("BENCH_INTERP", "Simplex"),
            "system.geometry.pos_encoding_config.dense_cell_packing="
            + os.environ.get("BENCH_PACKING", "true"),
            # r4 row-count levers on the dense occgrid path: coarse-levels
            # density pass reshapes the CDF, full geometry evals shrink
            # 512 -> BENCH_COMPACT. BENCH_COMPACT=0 for reference parity.
            "system.renderer.num_samples_compact="
            + os.environ.get("BENCH_COMPACT", "128"),
            "system.renderer.prop_encode_levels="
            + os.environ.get("BENCH_PROP_LEVELS", "3"),
        ] + _RESLICE),
    # sd_nerf at the 256² milestone stage: the reference workload spends
    # 15k of its 25k steps here (resolution milestone at 10k,
    # reference configs/single-prompt_benchmark/asd_sd_nerf.yaml) — the
    # dominant-cost stage, never timed before r5 (VERDICT r4 missing #4).
    # 65536 rays/step, ray-chunk 4096, renderer remat OFF (r5 measured:
    # 0.064 it/s no-remat vs 0.0404 remat'd at the same chunk; chunk
    # 8192 exhausts HBM planning). NOTE every earlier "256² doesn't
    # fit" compile crash was the EAGER flax-init bug — the unjitted
    # init materialized the full 33.5M-point encode op-by-op — fixed by
    # BaseLift3DSystem.init_rays' 64² cap, NOT by remat/chunk choices.
    # BENCH_REMAT_256=1 / BENCH_CHUNK_256=N to probe variants.
    "sd_nerf_256": dict(
        config="configs/single-prompt_benchmark/asd_sd_nerf.yaml",
        env={"SDTPU_REMAT_RENDERER":
             os.environ.get("BENCH_REMAT_256", "0")},
        overrides=OFFLINE + SD_OFFLINE + [
            "tag=bench_sd_nerf_256",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            'system.prompt_processor.prompt="a benchmark object"',
            "data.width=256", "data.height=256", "data.batch_size=1",
            "data.resolution_milestones=[]",
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK_256", "4096"),
            "system.geometry.normal_type="
            + os.environ.get("BENCH_NORMALS", "analytic"),
            "system.geometry.pos_encoding_config.interpolation="
            + os.environ.get("BENCH_INTERP", "Simplex"),
            "system.geometry.pos_encoding_config.dense_cell_packing="
            + os.environ.get("BENCH_PACKING", "true"),
            "system.renderer.num_samples_compact="
            + os.environ.get("BENCH_COMPACT", "128"),
            "system.renderer.prop_encode_levels="
            + os.environ.get("BENCH_PROP_LEVELS", "3"),
        ] + _RESLICE),
    # single-prompt ASD-MVDream NeRF (B=4 views, 256 samples/ray)
    "mv_nerf": dict(
        config="configs/single-prompt_benchmark/asd_mv_nerf.yaml",
        overrides=OFFLINE + [
            "tag=bench_mv_nerf",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            'system.prompt_processor.prompt="a benchmark object"',
            # unchunked default since r4: the compaction levers shrank the
            # program enough that the unchunked step compiles AND runs
            # 2.2x the chunked rate (0.3659 vs 0.1675 it/s, r4 measured)
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK", "0"),
            # TPU-first encode options (measured-best, same set as the
            # hyper_ingp row): analytic normals share the fused
            # encode+grad; Simplex halves gather rows vs trilinear.
            # BENCH_NORMALS=finite_difference BENCH_INTERP=Linear
            # BENCH_PACKING=false restore reference-parity options.
            "system.geometry.normal_type="
            + os.environ.get("BENCH_NORMALS", "analytic"),
            "system.geometry.pos_encoding_config.interpolation="
            + os.environ.get("BENCH_INTERP", "Simplex"),
            "system.geometry.pos_encoding_config.dense_cell_packing="
            + os.environ.get("BENCH_PACKING", "true"),
            # r4 row-count levers (see sd_nerf): 256 -> BENCH_COMPACT full
            # evals per ray; BENCH_COMPACT=0 for reference parity
            "system.renderer.num_samples_compact="
            + os.environ.get("BENCH_COMPACT", "96"),
            "system.renderer.prop_encode_levels="
            + os.environ.get("BENCH_PROP_LEVELS", "3"),
        ] + _RESLICE),
    # Hyper-iNGP + SD amortized (the north-star row; same as bench.py)
    "hyper_ingp": dict(
        config="configs/multi-prompt_benchmark/asd_sd_hyper_iNGP_50k.yaml",
        overrides=OFFLINE + SD_OFFLINE + [
            "tag=bench_hyper_ingp",
            "system.prompt_processor.prompt_library=magic3d_15_prompt_library",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            # unchunked + TPU-first encode options: the bench.py defaults
            # (chunking was a compile-helper workaround; unchunked compiles)
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK", "0"),
            "system.geometry.normal_type=analytic",
            "system.geometry.pos_encoding_config.interpolation="
            + os.environ.get("BENCH_INTERP", "Simplex"),
            "system.geometry.pos_encoding_config.dense_cell_packing="
            + os.environ.get("BENCH_PACKING", "true"),
            # coarse-levels-only proposal encode (see bench.py; 0 = parity)
            "system.renderer.prop_encode_levels="
            + os.environ.get("BENCH_PROP_LEVELS", "3"),
        ] + _RESLICE),
    # 3DConv-net + SD amortized
    "conv3d": dict(
        config="configs/multi-prompt_benchmark/asd_sd_3dconv_net_50k.yaml",
        overrides=OFFLINE + SD_OFFLINE + [
            "tag=bench_conv3d",
            "system.prompt_processor.prompt_library=magic3d_15_prompt_library",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK", "0"),
        ]),
    # 3DConv-net + SD at CP100k scale (channel_multiplier 2, Adan —
    # asd_sd_3dconv_net_300k.yaml; same per-step compute as the 300k run)
    "conv3d_300k": dict(
        config="configs/multi-prompt_benchmark/asd_sd_3dconv_net_300k.yaml",
        overrides=OFFLINE + SD_OFFLINE + [
            "tag=bench_conv3d_300k",
            # the CP100k corpus json is a missing blob in the reference
            # too; per-step compute is corpus-independent
            "system.prompt_processor.prompt_library=magic3d_15_prompt_library",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK", "0"),
        ]),
    # Triplane-Transformer + MVDream amortized
    "triplane": dict(
        config="configs/multi-prompt_benchmark/"
               "asd_mv_triplane_transformer_10k.yaml",
        overrides=OFFLINE + [
            "tag=bench_triplane",
            "system.prompt_processor.prompt_library=magic3d_15_prompt_library",
            "system.prompt_processor.pretrained_model_name_or_path=__offline__",
            # unchunked default since r4 (0.3107 it/s measured vs 0.305
            # at ray-chunk 1024 in r2; the r2 compile crash is gone)
            "system.renderer.train_chunk_size="
            + os.environ.get("BENCH_CHUNK", "0"),
        ]),
}


def bench_one(name: str, n_steps: int, n_warmup: int):
    import contextlib

    import jax
    import numpy as np

    cache_dir = os.environ.get("SDTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/sdtpu_xla"))
    with contextlib.suppress(Exception):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import scaledreamer_tpu as sd
    from scaledreamer_tpu.core.config import load_config, parse_structured

    sd.ensure_builtins()
    spec = WORKLOADS[name]
    # per-row env (consumed lazily, e.g. SDTPU_REMAT_RENDERER is read
    # inside make_train_step) — set for this row only, restore after
    saved_env = {k: os.environ.get(k) for k in spec.get("env", {})}
    os.environ.update(spec.get("env", {}))
    cfg = load_config(spec["config"], cli_args=spec["overrides"],
                      n_gpus=jax.device_count())
    dm_cls = sd.find(cfg.data_type)
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, cfg.data), seed=0)
    system_cls = sd.find(cfg.system_type)
    system = system_cls(cfg=parse_structured(system_cls.Config, cfg.system))

    rng = jax.random.PRNGKey(0)
    dm.setup("fit")
    system.on_fit_start(rng)
    batch = system.prepare_batch(dm.train_batch())
    state = system.init_state(jax.random.fold_in(rng, 1), batch)
    train_step = system.make_train_step()  # consumes the per-row env
    for k, v in saved_env.items():
        os.environ.pop(k, None) if v is None else os.environ.update({k: v})
    occ_update = system.make_occgrid_update()
    gp = system.guidance_params

    def run_step(state, i):
        b = system.prepare_batch(dm.train_batch())
        jb = {k: v for k, v in b.items()
              if isinstance(v, (np.ndarray, jax.Array))}
        scalars = system.schedule_scalars(0, i)
        if occ_update is not None and state.occ_grid is not None and \
                i % 16 == 0 and i > 0:
            state = occ_update(state, jax.random.fold_in(rng, 7000 + i))
        return train_step(state, gp, jb, scalars, jax.random.fold_in(rng, i))

    # BENCH_PRINT_LOSS=1: per-step loss readback (diagnosis mode — the
    # sync forced each step makes the pipelined timing meaningless)
    print_loss = os.environ.get("BENCH_PRINT_LOSS") == "1"

    for i in range(n_warmup):
        state, metrics = run_step(state, i)
    float(np.asarray(metrics["loss"]))

    # pipelined wall-clock: one scalar readback after the timed window
    # (bench.py methodology; readback anchors completion on the relay)
    t0 = time.perf_counter()
    for i in range(n_warmup, n_warmup + n_steps):
        state, metrics = run_step(state, i)
        if print_loss:
            print(f"# {name} step {i}: " + " ".join(
                f"{k}={float(np.asarray(v)):.4g}"
                for k, v in sorted(metrics.items())
                if getattr(v, 'ndim', 1) == 0), file=sys.stderr, flush=True)
    loss = float(np.asarray(metrics["loss"]))
    elapsed = time.perf_counter() - t0

    t1 = time.perf_counter()
    n_sync = max(2, n_steps // 4)
    for i in range(n_warmup + n_steps, n_warmup + n_steps + n_sync):
        state, metrics = run_step(state, i)
        loss = float(np.asarray(metrics["loss"]))
    sync_rate = n_sync / (time.perf_counter() - t1)

    B, H, W = batch["rays_o"].shape[:3]
    return {
        "workload": name,
        "config": spec["config"],
        "iters_per_sec": round(n_steps / elapsed, 4),
        "sync_iters_per_sec": round(sync_rate, 4),
        "batch": [int(B), int(H), int(W)],
        "steps_timed": n_steps,
        "loss_final": loss,
        "device": str(__import__("jax").devices()[0]),
    }


def bench_eval_512(n_frames: int, n_warmup: int):
    """512² eval-render rays/sec through the chunked full-image eval path
    (systems/base.py make_eval_render) on the north-star Hyper-iNGP
    workload — refreshes the r2-era BASELINE.md microbench row."""
    import contextlib

    import jax
    import numpy as np

    cache_dir = os.environ.get("SDTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/sdtpu_xla"))
    with contextlib.suppress(Exception):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import scaledreamer_tpu as sd
    from scaledreamer_tpu.core.config import load_config, parse_structured

    sd.ensure_builtins()
    res = int(os.environ.get("BENCH_EVAL_RES", "512"))
    spec = WORKLOADS["hyper_ingp"]
    cfg = load_config(spec["config"], cli_args=spec["overrides"] + [
        f"data.eval_height={res}", f"data.eval_width={res}",
    ], n_gpus=jax.device_count())
    dm_cls = sd.find(cfg.data_type)
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, cfg.data), seed=0)
    system_cls = sd.find(cfg.system_type)
    system = system_cls(cfg=parse_structured(system_cls.Config, cfg.system))

    rng = jax.random.PRNGKey(0)
    dm.setup("fit")
    dm.setup("validate")
    system.on_fit_start(rng)
    batch = system.prepare_batch(dm.train_batch())
    state = system.init_state(jax.random.fold_in(rng, 1), batch)
    render = system.make_eval_render(
        chunk_rays=int(os.environ.get("BENCH_EVAL_CHUNK", "65536")))
    ds = dm.val_dataset
    it = iter(ds)

    def one_frame():
        b = system.prepare_batch(next(it))
        out = render(state.params, b)
        # anchor completion on a readback (relay block_until_ready no-op)
        return float(np.asarray(out["comp_rgb"]).mean())

    for _ in range(n_warmup):
        one_frame()
    t0 = time.perf_counter()
    for _ in range(n_frames):
        one_frame()
    elapsed = time.perf_counter() - t0
    return {
        "workload": "eval_512",
        "config": spec["config"],
        "frames_per_sec": round(n_frames / elapsed, 4),
        "rays_per_sec": round(n_frames * res * res / elapsed, 1),
        "resolution": res,
        "frames_timed": n_frames,
        "device": str(jax.devices()[0]),
    }


# queue order when no rows are given: never-measured rows first so a
# timed-out queue still advances coverage (VERDICT r4 #3 — the conv3d
# family ran last for three rounds and never produced a number)
DEFAULT_ORDER = ["conv3d", "conv3d_300k", "sd_nerf_256", "triplane",
                 "sd_nerf", "mv_nerf", "hyper_ingp"]


def main():
    rows = sys.argv[1:] or [r for r in DEFAULT_ORDER if r in WORKLOADS]
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    n_warmup = int(os.environ.get("BENCH_WARMUP", 2))
    results_dir = os.environ.get("BENCH_RESULTS", "outputs/_bench_rows")
    os.makedirs(results_dir, exist_ok=True)
    results = []
    for name in rows:
        row_path = os.path.join(results_dir, f"{name}.json")
        if os.environ.get("BENCH_RESUME") == "1" and os.path.exists(row_path):
            with open(row_path) as f:
                prev = json.load(f)
            if "error" not in prev:  # failed rows always re-run
                prev["resumed_from"] = row_path
                print(json.dumps(prev), flush=True)
                results.append(prev)
                continue
        try:
            if name == "eval_512":
                r = bench_eval_512(max(4, n_steps // 4), 1)
            else:
                r = bench_one(name, n_steps, n_warmup)
        except Exception as e:  # keep going; report the failure
            r = {"workload": name, "error": f"{type(e).__name__}: {e}"[:1500]}
        with open(row_path, "w") as f:
            json.dump(r, f)
        print(json.dumps(r), flush=True)
        results.append(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
