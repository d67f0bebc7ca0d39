"""ScaleDreamer-TPU launcher.

Parity target: reference `launch.py:109-306` — same CLI surface:

    python launch.py --config configs/... --train [--gpu 0] key=value ...

`--gpu` selects TPU chips (maps to JAX's visible-device control rather than
CUDA_VISIBLE_DEVICES). `--train/--validate/--test/--export` dispatch.
Extra args are dotlist config overrides. Trial dirs land in
`outputs/<name>/<tag><timestamp>` with config snapshots and cmd.txt, as in
the reference.
"""

from __future__ import annotations

import argparse
import contextlib
import logging
import os
import sys
import time


def main(args, extras) -> None:
    if args.gpu is not None:
        # chip selection before jax init (reference launch.py:110-126 does
        # the same trick with CUDA_VISIBLE_DEVICES)
        os.environ.setdefault("JAX_VISIBLE_DEVICES", args.gpu)
        os.environ.setdefault("TPU_VISIBLE_DEVICES", args.gpu)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="[%(levelname)s] %(asctime)s %(name)s: %(message)s",
        datefmt="%H:%M:%S")
    for noisy in ("jax", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    logger = logging.getLogger("launch")

    import jax

    # multi-host bootstrap (SURVEY.md §2.2: jax.distributed.initialize
    # replaces the reference's NCCL/SLURM process-group env bootstrap,
    # misc.py:18-26). Coordinator/process env vars are read by JAX itself
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or the
    # TPU pod metadata); opt-in so single-host runs never block on it.
    if os.environ.get("SDTPU_MULTIHOST"):
        jax.distributed.initialize()

    # persistent XLA compilation cache: repeat runs (eval-only, resumes,
    # milestone re-compiles) skip the multi-minute first compile
    cache_dir = os.environ.get("SDTPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/sdtpu_xla"))
    with contextlib.suppress(Exception):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import scaledreamer_tpu as sd
    from scaledreamer_tpu.core.config import dump_config, load_config
    from scaledreamer_tpu.core.config import parse_structured
    from scaledreamer_tpu.trainer import Trainer

    sd.ensure_builtins()
    load_custom_modules(logger)

    if getattr(args, "typecheck", False):
        # runtime shape-contract checking (reference launch.py:135-138)
        from scaledreamer_tpu.core import typing as sdtyping
        sdtyping.enable()
        logger.info("shape-contract typecheck enabled")

    n_devices = jax.device_count()
    cfg = load_config(args.config, cli_args=extras, n_gpus=n_devices)

    # per-process seed offset (reference launch.py:171)
    seed = cfg.seed + jax.process_index()

    dm_cls = sd.find(cfg.data_type)
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, cfg.data), seed=seed)
    system_cls = sd.find(cfg.system_type)
    system = system_cls(cfg=parse_structured(system_cls.Config, cfg.system))

    # config + command + code snapshots (reference utils/callbacks.py:60-110)
    if jax.process_index() == 0:
        import shutil
        os.makedirs(os.path.join(cfg.trial_dir, "configs"), exist_ok=True)
        dump_config(os.path.join(cfg.trial_dir, "configs", "parsed.yaml"), cfg)
        with contextlib.suppress(OSError):
            shutil.copyfile(args.config,
                            os.path.join(cfg.trial_dir, "configs",
                                         "raw.yaml"))
        with open(os.path.join(cfg.trial_dir, "cmd.txt"), "w") as f:
            f.write(" ".join(sys.argv))
        if args.train:
            from scaledreamer_tpu.core.callbacks import save_code_snapshot
            save_code_snapshot(cfg.trial_dir)

    trainer = Trainer(system, dm, cfg.trainer, cfg.checkpoint, cfg.trial_dir,
                      seed=seed, profile=getattr(args, "profile", False))

    resume = find_last_path(cfg.resume)
    if args.train:
        trainer.fit(resume=resume)
        trainer.test()
    elif args.validate:
        state = _restore_for_eval(trainer, system, dm, resume)
        trainer.validate(state)
    elif args.test:
        state = _restore_for_eval(trainer, system, dm, resume)
        trainer.test(state)
    elif args.export:
        state = _restore_for_eval(trainer, system, dm, resume)
        from scaledreamer_tpu.models.exporters.mesh_exporter import run_export
        run_export(system, state, cfg, trainer.save_dir)
    else:
        raise ValueError(
            "One of --train/--validate/--test/--export is required")


def _restore_for_eval(trainer, system, dm, resume):
    import jax
    rng = jax.random.PRNGKey(0)
    dm.setup("fit")
    system.on_fit_start(rng)
    batch = dm.train_batch()
    state = system.init_state(rng, batch)
    if resume:
        state, step = trainer.load_checkpoint(resume, state)
        trainer.global_step = step
    return state


def load_custom_modules(logger) -> None:
    """Import every package under custom/ (reference launch.py:75-105)."""
    if not os.path.isdir("custom"):
        return
    import importlib
    sys.path.insert(0, os.getcwd())
    for name in sorted(os.listdir("custom")):
        pkg = os.path.join("custom", name)
        if os.path.isdir(pkg) and os.path.exists(
                os.path.join(pkg, "__init__.py")):
            t0 = time.perf_counter()
            with contextlib.suppress(ImportError):
                importlib.import_module(f"custom.{name}")
            logger.info("Imported custom module custom/%s (%.2fs)", name,
                        time.perf_counter() - t0)


def find_last_path(path):
    """Resolve the literal 'LAST' in paths to the newest match
    (reference threestudio/utils/misc.py:143-161)."""
    if path is None or "LAST" not in path:
        return path
    import glob
    candidates = sorted(
        glob.glob(path.replace("LAST", "*")), key=os.path.getmtime)
    if not candidates:
        raise FileNotFoundError(f"No match for {path}")
    return candidates[-1]


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config file")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true")
    group.add_argument("--validate", action="store_true")
    group.add_argument("--test", action="store_true")
    group.add_argument("--export", action="store_true")
    parser.add_argument("--gpu", default=None,
                        help="device indices to use (TPU chips)")
    parser.add_argument("--gradio", action="store_true",
                        help="gradio mode: progress goes to the trial-dir "
                             "progress file; stdout redirected to stderr "
                             "(reference launch.py:286-306)")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of steps 5-15")
    parser.add_argument("--typecheck", action="store_true",
                        help="enable runtime shape-contract checking "
                             "(reference jaxtyping/typeguard hook analog)")
    args, extras = parser.parse_known_args()
    if args.gradio:
        # frontend reads the trial-dir progress file; keep stdout clean
        # (reference launch.py:301-306)
        with contextlib.redirect_stdout(sys.stderr):
            main(args, extras)
    else:
        main(args, extras)
