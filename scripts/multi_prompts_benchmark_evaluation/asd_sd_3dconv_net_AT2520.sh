# Evaluation: render test orbits from a checkpoint then score with CLIP
# (reference scripts/multi_prompts_benchmark_evaluation/asd_sd_3dconv_net_AT2520.sh)
python launch.py \
    --config configs/multi-prompt_benchmark/asd_sd_3dconv_net_50k.yaml \
    --test \
    system.prompt_processor.prompt_library="att3d_2520_prompt_library" \
    resume="outputs/asd_sd_3dconv_net_50k/LAST/ckpts/last.ckpt"
python evaluation/CLIP/evaluation_amortized.py \
    --result_dir "outputs/asd_sd_3dconv_net_50k/LAST/save/it0-test"
