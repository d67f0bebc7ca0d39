"""Every shipped benchmark YAML parses and builds its system + datamodule.

The configs are the public surface a reference user brings over verbatim
(reference configs/*-prompt_benchmark/*.yaml); this guards the whole
registry/config chain (resolvers, C() lists, required ???, registered
names) without initializing any parameters.
"""

import glob
import os

import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import load_config, parse_structured

sd.ensure_builtins()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OFFLINE = [
    "use_timestamp=false", "tag=cfgtest", "exp_root_dir=outputs/_cfgtest",
    "system.prompt_processor.pretrained_model_name_or_path=__offline__",
]

CONFIGS = sorted(
    glob.glob(os.path.join(ROOT, "configs", "*-prompt_benchmark", "*.yaml")))


def _overrides(path: str):
    out = list(OFFLINE)
    if "multi-prompt" in path:
        out.append(
            "system.prompt_processor.prompt_library=magic3d_15_prompt_library")
    else:
        out.append('system.prompt_processor.prompt="a test object"')
    if "_mv_" in os.path.basename(path):
        pass  # MVDream guidance: ckpt_path default already offline-tolerant
    else:
        out.append("system.guidance.pretrained_model_name_or_path=__offline__")
    return out


@pytest.mark.parametrize("path", CONFIGS,
                         ids=[os.path.basename(p) for p in CONFIGS])
def test_benchmark_config_builds(path):
    cfg = load_config(path, cli_args=_overrides(path), n_gpus=1)
    dm_cls = sd.find(cfg.data_type)
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, cfg.data), seed=0)
    assert dm is not None
    system_cls = sd.find(cfg.system_type)
    system = system_cls(cfg=parse_structured(system_cls.Config, cfg.system))
    # modules registered by name are constructed (no params initialized)
    assert system.geometry is not None
    assert system.renderer is not None
    # every shipped benchmark trains >= 10k steps
    assert cfg.trainer["max_steps"] >= 10000
