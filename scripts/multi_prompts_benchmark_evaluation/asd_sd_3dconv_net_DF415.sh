# Evaluation: render test orbits from a checkpoint then score with CLIP
# (reference scripts/multi_prompts_benchmark_evaluation/asd_sd_3dconv_net_DF415.sh)
python launch.py \
    --config configs/multi-prompt_benchmark/asd_sd_3dconv_net_100k.yaml \
    --test \
    system.prompt_processor.prompt_library="dreamfusion_415_prompt_library" \
    resume="outputs/asd_sd_3dconv_net_100k/LAST/ckpts/last.ckpt"
python evaluation/CLIP/evaluation_amortized.py \
    --result_dir "outputs/asd_sd_3dconv_net_100k/LAST/save/it0-test"
