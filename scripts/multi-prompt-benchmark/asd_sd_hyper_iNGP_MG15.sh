# Hyper-iNGP + SD-ASD on MG15 (reference scripts/multi-prompt-benchmark/asd_sd_hyper_iNGP_MG15.sh)
# On TPU all local chips join the data mesh automatically; use --gpu to restrict.
python launch.py \
    --config configs/multi-prompt_benchmark/asd_sd_hyper_iNGP_50k.yaml \
    --train \
    system.prompt_processor.prompt_library="magic3d_15_prompt_library"
