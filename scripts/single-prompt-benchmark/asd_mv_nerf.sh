# Single-prompt ASD-MVDream NeRF (reference scripts/single-prompt-benchmark/asd_mv_nerf.sh)
python launch.py \
    --config configs/single-prompt_benchmark/asd_mv_nerf.yaml \
    --train \
    --gpu 0 \
    system.prompt_processor.prompt="A DSLR photo of a peacok on a surfboard."
