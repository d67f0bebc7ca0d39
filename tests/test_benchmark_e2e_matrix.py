"""End-to-end matrix over all shipped benchmark YAMLs through the REAL CLI.

Tiny-trains every config under configs/*-prompt_benchmark/ via a
`python launch.py --train` subprocess (fresh interpreter, real argv parsing,
real registry resolution, real checkpoint writing) — the full user path,
not an in-process config build (that is tests/test_configs.py).

Heavy by construction (9 subprocesses, each paying a fresh XLA compile), so
it is gated behind SDTPU_E2E_MATRIX=1 and excluded from the default suite:

    SDTPU_E2E_MATRIX=1 python -m pytest tests/test_benchmark_e2e_matrix.py -v

Mirrors the reference's launch path (reference launch.py:106-225) at the
scale of its benchmark suite (reference configs/*-prompt_benchmark/*.yaml).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SDTPU_E2E_MATRIX") != "1",
    reason="set SDTPU_E2E_MATRIX=1 to run the benchmark e2e matrix "
           "(9 subprocess trains; ~30-60 min on 1 CPU core)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Tiny-run overrides shared by every row: 2 steps, 32² render, offline
# (random-init) diffusion weights, 4-block tiny UNet/VAE, no validation.
COMMON = [
    "trainer.max_steps=2",
    "trainer.val_check_interval=0",
    "trainer.num_sanity_val_steps=0",
    "use_timestamp=false",
    "tag=e2e",
    "data.width=32", "data.height=32",
    # --train runs the post-fit test orbit too (reference behavior);
    # default is 120 views/prompt at full eval res — shrink it or the
    # orbit render dwarfs the 2-step train on one CPU core
    "data.eval_height=32", "data.eval_width=32",
    "data.n_test_views=2", "data.n_val_views=2",
    # 32 = the UNet's GroupNorm group count (the smallest block width a
    # structurally-real tiny UNet admits; the quality smoke uses the same)
    "system.guidance.unet_block_channels=[32,32,32,32]",
    "system.guidance.vae_block_channels=[32,32,32,32]",
    "system.guidance.image_size=64",
    "system.guidance.latent_size=8",
]
PP = ["system.prompt_processor.pretrained_model_name_or_path=__offline__"]
# SD guidance takes pretrained_model_name_or_path; MVDream takes ckpt_path
# (a missing path falls back to random init — identical compute)
SD_G = PP + ["system.guidance.pretrained_model_name_or_path=__offline__"]
MV_G = PP + ["system.guidance.ckpt_path=__offline__"]
PROMPT = ['system.prompt_processor.prompt=a test object']
LIBRARY = ["system.prompt_processor.prompt_library="
           "magic3d_15_prompt_library"]
# single-prompt data configs carry resolution-milestone lists; flatten to
# one tiny stage so the data.width/height scalar overrides are consistent
FLAT_RES = ["data.resolution_milestones=[]"]
SHRINK_SAMPLES = ["system.renderer.num_samples_per_ray=32"]
SHRINK_IMPORTANCE = ["system.renderer.num_samples_per_ray=16",
                     "system.renderer.num_samples_per_ray_importance=16"]
SHRINK_HASH = ["system.geometry.pos_encoding_config.log2_hashmap_size=12"]
# generator shrinks: the matrix validates the LAUNCH PATH, not model scale
# (a full-width triplane transformer / 128³ conv pyramid takes >40 min for
# 2 steps on this box's single CPU core). condition_dim/c_dim stay at 1024
# = the text-embedding width the prompt processor feeds.
SHRINK_TRIPLANE = [
    "system.geometry.space_generator_config.inner_dim=128",
    "system.geometry.space_generator_config.num_layers=2",
    "system.geometry.space_generator_config.num_heads=4",
    "system.geometry.space_generator_config.triplane_low_res=8",
    "system.geometry.space_generator_config.triplane_high_res=16",
    "system.geometry.space_generator_config.triplane_dim=16",
]
SHRINK_CONV3D = [
    "system.geometry.space_generator_config.img_resolution=32",
    "system.geometry.space_generator_config.w_dim=64",
    "system.initialize_shape=false",  # skip the 1000-step sphere pre-fit
]

MATRIX = {
    "single-prompt_benchmark/asd_sd_nerf.yaml":
        SD_G + PROMPT + FLAT_RES + ["data.batch_size=1"] + SHRINK_SAMPLES
        + SHRINK_HASH,
    "single-prompt_benchmark/asd_mv_nerf.yaml":
        MV_G + PROMPT + FLAT_RES + ["data.batch_size=4"] + SHRINK_SAMPLES
        + SHRINK_HASH,
    "multi-prompt_benchmark/asd_sd_hyper_iNGP_50k.yaml":
        SD_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_HASH,
    "multi-prompt_benchmark/asd_sd_hyper_iNGP_50k_tpu.yaml":
        SD_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_HASH,
    "multi-prompt_benchmark/asd_sd_3dconv_net_50k.yaml":
        SD_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_CONV3D,
    "multi-prompt_benchmark/asd_sd_3dconv_net_100k.yaml":
        SD_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_CONV3D,
    # the CP100k corpus json is a missing blob in the reference too;
    # magic3d_15 stands in (same pipeline, different rows)
    "multi-prompt_benchmark/asd_sd_3dconv_net_300k.yaml":
        SD_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_CONV3D,
    "multi-prompt_benchmark/asd_mv_triplane_transformer_10k.yaml":
        MV_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_TRIPLANE,
    "multi-prompt_benchmark/asd_mv_triplane_transformer_10k_1GPU.yaml":
        MV_G + LIBRARY + SHRINK_IMPORTANCE + SHRINK_TRIPLANE,
}


@pytest.mark.parametrize("config", sorted(MATRIX))
def test_benchmark_config_trains_e2e(config, tmp_path):
    cfg_path = os.path.join(REPO, "configs", config)
    assert os.path.exists(cfg_path), cfg_path
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",   # never touch the TPU tunnel from tests
        # conftest.py exports --xla_force_host_platform_device_count=8 for
        # the in-process sharding tests; inheriting it here makes the
        # subprocess tiny-train run 8 virtual devices on one core (8× the
        # buffers — 48 GB RSS observed on the conv3d rows — and a 10×
        # slower compile+step). The CLI user path is single-device.
        XLA_FLAGS="",
        SDTPU_COMPILE_CACHE=os.environ.get(
            "SDTPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/sdtpu_xla")),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "launch.py"),
         "--config", cfg_path, "--train",
         f"exp_root_dir={tmp_path}"] + COMMON + MATRIX[config],
        capture_output=True, text=True, env=env, cwd=REPO,
        timeout=int(os.environ.get("SDTPU_E2E_TIMEOUT", "2400")))
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    # the run directory is <exp_root>/<config name:>/e2e; glob because the
    # yaml name: field doesn't always match the file basename
    ckpts = list(tmp_path.glob("*/e2e/ckpts/last.ckpt"))
    assert ckpts, f"no checkpoint written under {tmp_path}"
    assert list(tmp_path.glob("*/e2e/metrics.csv"))
