# Evaluation: render test orbits from a checkpoint then score with CLIP
# (reference scripts/multi_prompts_benchmark_evaluation/asd_mv_triplane_transformer_DL17k.sh)
python launch.py \
    --config configs/multi-prompt_benchmark/asd_mv_triplane_transformer_10k.yaml \
    --test \
    system.prompt_processor.prompt_library="instant3d_17000_prompt_library" \
    resume="outputs/asd_mv_triplane_100k/LAST/ckpts/last.ckpt"
python evaluation/CLIP/evaluation_amortized.py \
    --result_dir "outputs/asd_mv_triplane_100k/LAST/save/it0-test"
