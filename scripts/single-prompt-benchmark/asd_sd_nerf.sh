# Single-prompt ASD-SD NeRF (reference scripts/single-prompt-benchmark/asd_sd_nerf.sh)
python launch.py \
    --config configs/single-prompt_benchmark/asd_sd_nerf.yaml \
    --train \
    --gpu 0 \
    system.prompt_processor.prompt="A DSLR photo of a peacok on a surfboard."
