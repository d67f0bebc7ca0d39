"""Pretrained checkpoint pointers (reference scripts/download_pretrained_models.py).

This environment has no network egress; place the following files manually:
- pretrained/stable-diffusion-2-1-base/  (HF stabilityai/stable-diffusion-2-1-base,
  then run scripts/convert_sd_checkpoint.py to produce flax_params.msgpack)
- pretrained/sd-v2.1-base-4view.pt       (MVDream weights)
"""
print(__doc__)
