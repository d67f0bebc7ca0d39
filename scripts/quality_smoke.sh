#!/usr/bin/env bash
# One-command quality smoke: short MG15 train -> test-orbit render -> CLIP
# similarity + R-precision. See QUALITY.md. Auto-detects pretrained weights;
# without them it dry-runs the identical pipeline with --random_init CLIP
# and offline (random-init) SD — plumbing validation only.
set -euo pipefail
cd "$(dirname "$0")/.."

SD_DIR=${SD_DIR:-pretrained/stable-diffusion-2-1-base}
CLIP_DIR=${CLIP_DIR:-pretrained/clip-vit-large-patch14}
STEPS=${QUALITY_STEPS:-30}
EXP_ROOT=${QUALITY_EXP_ROOT:-outputs/_quality_smoke}

if [ -z "${QUALITY_MODE:-}" ]; then
  if [ -f "$SD_DIR/flax_params.msgpack" ] && [ -d "$CLIP_DIR" ]; then
    QUALITY_MODE=real
  else
    QUALITY_MODE=dry
  fi
fi
echo "[quality_smoke] mode=$QUALITY_MODE steps=$STEPS"

if [ "$QUALITY_MODE" = real ]; then
  VIEWS=${QUALITY_TEST_VIEWS:-120}   # reference protocol
  EVAL_RES=${QUALITY_EVAL_RES:-512}  # reference test resolution
  MODEL_ARGS=(
    "system.guidance.pretrained_model_name_or_path=$SD_DIR"
    "system.prompt_processor.pretrained_model_name_or_path=$SD_DIR"
  )
  EVAL_ARGS=(--model "$CLIP_DIR")
else
  VIEWS=${QUALITY_TEST_VIEWS:-8}
  EVAL_RES=${QUALITY_EVAL_RES:-64}   # keep the plumbing dry-run cheap
  MODEL_ARGS=(
    "system.guidance.pretrained_model_name_or_path=__offline__"
    "system.prompt_processor.pretrained_model_name_or_path=__offline__"
  )
  if [ "${QUALITY_TINY:-1}" = 1 ]; then
    # random-init weights make the FULL UNet pointless for plumbing
    # validation; a tiny one exercises the same code path in minutes on CPU
    # (QUALITY_TINY=0 for the full architecture, e.g. on chip)
    MODEL_ARGS+=(
      "system.guidance.unet_block_channels=[32,32,32,32]"
      "system.guidance.vae_block_channels=[32,32,32,32]"
      "system.guidance.image_size=64"
      "system.guidance.latent_size=8"
    )
  fi
  EVAL_ARGS=(--random_init)
fi

COMMON=(
  --config configs/multi-prompt_benchmark/asd_sd_hyper_iNGP_50k.yaml
  "system.prompt_processor.prompt_library=magic3d_15_prompt_library"
  "exp_root_dir=$EXP_ROOT" "use_timestamp=false" "tag=smoke"
  "trainer.val_check_interval=0"
  "data.n_test_views=$VIEWS"
  "data.eval_height=$EVAL_RES" "data.eval_width=$EVAL_RES"
  "${MODEL_ARGS[@]}"
)

rm -rf "$EXP_ROOT/asd_sd_hyper_iNGP_50k/smoke"
echo "[quality_smoke] 1/3 train $STEPS steps (MG15, Hyper-iNGP + SD-ASD)"
python launch.py "${COMMON[@]}" --train "trainer.max_steps=$STEPS"

CKPT="$EXP_ROOT/asd_sd_hyper_iNGP_50k/smoke/ckpts/last.ckpt"
echo "[quality_smoke] 2/3 render $VIEWS-view test orbits from $CKPT"
python launch.py "${COMMON[@]}" --test "resume=$CKPT"

RESULT_DIR=$(ls -d "$EXP_ROOT/asd_sd_hyper_iNGP_50k/smoke/save/"it*-test | tail -1)
echo "[quality_smoke] 3/3 CLIP similarity + R-precision over $RESULT_DIR"
python evaluation/CLIP/evaluation_amortized.py \
    --result_dir "$RESULT_DIR" "${EVAL_ARGS[@]}"

echo "[quality_smoke] done:"
for f in similarity.txt recall.txt; do
  echo "--- $RESULT_DIR/$f"
  tail -3 "$RESULT_DIR/$f"
done
