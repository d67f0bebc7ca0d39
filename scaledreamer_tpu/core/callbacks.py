"""Run artifacts & observability hooks.

Parity target: reference `threestudio/utils/callbacks.py` —
CodeSnapshotCallback (git file-list copy), ProgressCallback (file-based %
for gradio frontends) — and the optional wandb logger from
`threestudio/utils/saving.py:24-66` / launch.py:216-231. No PL here: the
trainer calls these hooks directly at the matching points.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)


def save_code_snapshot(trial_dir: str) -> None:
    """Copy the repo's tracked (+untracked, unignored) files into
    `<trial_dir>/code` (reference CodeSnapshotCallback, callbacks.py:60-94;
    `load/*` excluded like the reference)."""
    savedir = os.path.join(trial_dir, "code")
    try:
        tracked = subprocess.check_output(
            'git ls-files -- ":!:load/*"', shell=True).splitlines()
        untracked = subprocess.check_output(
            "git ls-files --others --exclude-standard",
            shell=True).splitlines()
        files = {b.decode() for b in tracked} | {b.decode()
                                                 for b in untracked}
    except Exception:
        logger.warning("Code snapshot is not saved. Please make sure you "
                       "have git installed and are in a git repository.")
        return
    os.makedirs(savedir, exist_ok=True)
    for f in sorted(files):
        if not os.path.exists(f) or os.path.isdir(f):
            continue
        dst = os.path.join(savedir, f)
        os.makedirs(os.path.dirname(dst) or savedir, exist_ok=True)
        shutil.copyfile(f, dst)


class ProgressWriter:
    """File-based progress reporting (reference ProgressCallback,
    callbacks.py:121-156): a single-line file a frontend can poll."""

    def __init__(self, save_path: Optional[str]):
        self.save_path = save_path

    def write(self, msg: str) -> None:
        if not self.save_path:
            return
        try:
            with open(self.save_path, "w") as f:
                f.write(msg)
        except OSError:  # pragma: no cover
            pass

    def on_train_step(self, step: int, max_steps: int) -> None:
        self.write(
            f"Generation progress: {step / max(1, max_steps) * 100:.2f}%")

    def on_validation_start(self) -> None:
        self.write("Rendering validation image ...")

    def on_test_start(self) -> None:
        self.write("Rendering video ...")

    def on_predict_start(self) -> None:
        self.write("Exporting mesh assets ...")


def maybe_wandb(loggers_cfg: Optional[dict], trial_dir: str, config=None):
    """Optional wandb run (reference launch.py:216-224 / saving.py:56-66).

    Returns a live `wandb` module handle or None: disabled config or a
    missing wandb package (this image ships without it) degrade to None.
    """
    cfg = (loggers_cfg or {}).get("wandb", {})
    if not cfg or not cfg.get("enable", False):
        return None
    try:
        import wandb
    except ImportError:
        logger.warning("loggers.wandb.enable=true but wandb is not "
                       "installed; continuing without it")
        return None
    wandb.init(project=cfg.get("project", "scaledreamer_tpu"),
               name=cfg.get("name", os.path.basename(trial_dir)),
               dir=trial_dir, config=config)
    return wandb
