"""Callbacks + observability tests (reference utils/callbacks.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from scaledreamer_tpu.core.callbacks import (ProgressWriter, maybe_wandb,
                                             save_code_snapshot)


def test_code_snapshot_copies_tracked_files(tmp_path):
    save_code_snapshot(str(tmp_path))
    code = tmp_path / "code"
    assert (code / "launch.py").exists()
    assert (code / "scaledreamer_tpu" / "__init__.py").exists()
    # load/* excluded, like the reference git ls-files filter
    assert not (code / "load").exists()


def test_progress_writer(tmp_path):
    p = tmp_path / "progress"
    w = ProgressWriter(str(p))
    w.on_train_step(25, 100)
    assert p.read_text() == "Generation progress: 25.00%"
    w.on_validation_start()
    assert "validation" in p.read_text()
    w.on_test_start()
    assert "video" in p.read_text()
    # disabled writer is a no-op
    ProgressWriter(None).on_train_step(1, 2)


def test_maybe_wandb_disabled_and_missing(tmp_path):
    assert maybe_wandb(None, str(tmp_path)) is None
    assert maybe_wandb({"wandb": {"enable": False}}, str(tmp_path)) is None
    # enable=True with wandb not installed degrades to None (this image)
    assert maybe_wandb({"wandb": {"enable": True}}, str(tmp_path)) is None


def test_spatial_time_encoding():
    """4D spatial-time encoding (reference networks.py:68-126): summed
    3D + 4D grids, time-dependent output, frozen time table when static."""
    from scaledreamer_tpu.ops.networks import get_encoding

    enc = get_encoding(3, {"otype": "HashGridSpatialTime", "n_levels": 3,
                           "log2_hashmap_size": 8, "base_resolution": 4,
                           "per_level_scale": 1.5, "static": True})
    x = jax.random.uniform(jax.random.PRNGKey(0), (10, 3))
    params = enc.init(jax.random.PRNGKey(1), x)
    out = enc.apply(params, x)
    assert out.shape == (10, 6)
    out_t = enc.apply(params, x, frame_time=0.5)
    assert float(jnp.abs(out - out_t).max()) > 0  # time-conditioned
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
    assert float(jnp.abs(g["params"]["encoding"]["table_time"]).max()) == 0
    assert float(jnp.abs(g["params"]["encoding"]["table"]).max()) > 0

def test_trainer_warns_on_inert_keys(tmp_path, caplog):
    """PL-surface keys without effect must warn, not silently no-op
    (VERDICT r3: reference configs set some of these)."""
    import logging
    from types import SimpleNamespace

    from scaledreamer_tpu.trainer import Trainer

    class _Sys:
        cfg = SimpleNamespace(loggers=None)

    with caplog.at_level(logging.WARNING, logger="scaledreamer_tpu.trainer"):
        tr = Trainer(_Sys(), None,
                     {"max_steps": 1, "strategy": "deepspeed_stage_2",
                      "precision": "16-mixed",
                      "check_val_every_n_epoch": 2},
                     {}, str(tmp_path / "trial"))
    text = caplog.text
    assert "strategy" in text and "GSPMD" in text
    assert "precision" in text
    assert "check_val_every_n_epoch" in text

    # limit_val_batches semantics (PL): int count / fraction / 0 skips
    tr.cfg.limit_val_batches = 3
    assert tr._val_batch_limit(30) == 3
    tr.cfg.limit_val_batches = 0.5
    assert tr._val_batch_limit(30) == 15
    tr.cfg.limit_val_batches = 0
    assert tr._val_batch_limit(30) == 0
    tr.cfg.limit_val_batches = None
    assert tr._val_batch_limit(30) is None
