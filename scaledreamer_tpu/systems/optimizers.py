"""Optimizers: per-module param groups + Adan, on optax.

Parity targets:
- `parse_optimizer` per-module dotted param groups
  (reference threestudio/systems/utils.py:25-53): only modules listed under
  `optimizer.params` are optimized; unlisted parameters are FROZEN (the
  reference simply never passes them to the optimizer).
- `Adan` (reference threestudio/systems/optimizers.py:23-315) — three EMAs +
  gradient-difference term; the torch `_foreach` fused path maps to optax's
  natively-fused pytree updates on TPU (SURVEY.md §2.3 N8).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any        # m: EMA of grads
    exp_avg_diff: Any   # v: EMA of grad differences
    exp_avg_sq: Any     # n: EMA of (g + b2*diff)^2
    prev_grad: Any


def adan(learning_rate, b1: float = 0.98, b2: float = 0.92,
         b3: float = 0.99, eps: float = 1e-8,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adan (Xie et al. 2022), matching the reference's single-tensor math
    (threestudio/systems/optimizers.py:152-254, no_prox=False).

    `learning_rate` may be a schedule callable (step -> lr), evaluated at
    the pre-increment update count like optax's own optimizers."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdanState(jnp.zeros([], jnp.int32), zeros,
                         jax.tree.map(jnp.zeros_like, params),
                         jax.tree.map(jnp.zeros_like, params),
                         jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        count = state.count + 1
        # on the first step diff = 0 (prev_grad initialized to grad)
        is_first = (count == 1)
        prev = jax.tree.map(
            lambda g, p: jnp.where(is_first, g, p), grads, state.prev_grad)
        diff = jax.tree.map(lambda g, p: g - p, grads, prev)

        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        bc3 = 1.0 - b3 ** count.astype(jnp.float32)

        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                         state.exp_avg, grads)
        v = jax.tree.map(lambda v, d: b2 * v + (1 - b2) * d,
                         state.exp_avg_diff, diff)
        # reference _single_tensor_adan: neg_grad_or_diff.mul_(b2).add_(grad)
        # -> n tracks (g + b2*diff)^2
        upd = jax.tree.map(lambda g, d: g + b2 * d, grads, diff)
        n = jax.tree.map(lambda n, u: b3 * n + (1 - b3) * u * u,
                         state.exp_avg_sq, upd)

        def step(m_, v_, n_, p_):
            denom = jnp.sqrt(n_ / bc3) + eps
            # reference: step_size = lr/bc1, step_size_diff = lr*b2/bc2
            update = (m_ / bc1 + b2 * v_ / bc2) / denom
            new_p = p_ - lr * update
            # decoupled weight decay (proximal form): p /= (1 + lr*wd)
            if weight_decay > 0:
                new_p = new_p / (1.0 + lr * weight_decay)
            return new_p - p_

        updates = jax.tree.map(step, m, v, n, params)
        return updates, AdanState(count, m, v, n, grads)

    return optax.GradientTransformation(init_fn, update_fn)


def _make_single_optimizer(name: str, lr: float, args: Dict) -> optax.GradientTransformation:
    name = name.lower()
    betas = args.get("betas", (0.9, 0.999))
    eps = args.get("eps", 1e-8)
    wd = args.get("weight_decay", 0.0)
    if name in ("adamw", "fusedadam"):
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=wd)
    if name == "adam":
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if name == "adan":
        b = args.get("betas", (0.98, 0.92, 0.99))
        return adan(lr, b1=b[0], b2=b[1], b3=b[2], eps=eps, weight_decay=wd)
    if name == "sgd":
        return optax.sgd(lr, momentum=args.get("momentum", 0.0))
    raise ValueError(f"Unknown optimizer: {name}")


def _path_to_dotted(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        parts.append(str(key) if key is not None else str(p))
    return ".".join(parts)


def parse_optimizer(optimizer_cfg: Dict, params,
                    scheduler_cfg: Optional[Dict] = None
                    ) -> optax.GradientTransformation:
    """Build optax transform honoring the reference per-module group spec.

    optimizer_cfg: {name, args: {lr, betas, eps, ...},
                    params: {dotted.module.prefix: {lr: ...}, ...}}
    When `params` is given, leaves not under any listed prefix are frozen
    (reference systems/utils.py:34-42 passes only listed groups to torch).

    scheduler_cfg (`system.scheduler:` YAML, reference systems/utils.py:
    74-114) scales every group's base lr by the same per-step factor,
    like a torch scheduler stepping the whole optimizer.
    """
    name = optimizer_cfg.get("name", "AdamW")
    args = dict(optimizer_cfg.get("args", {}))
    groups: Optional[Dict] = optimizer_cfg.get("params")

    def with_schedule(base_lr):
        sched = parse_scheduler(scheduler_cfg, base_lr)
        return sched if sched is not None else base_lr

    if not groups:
        lr = args.get("lr", 1e-3)
        tx = _make_single_optimizer(name, with_schedule(lr), args)
        # EMA buffers (StyleGAN w_avg) live in params with zero grads but
        # must never see unconditional transforms (AdamW/Adan weight decay
        # would silently decay them toward 0 every step): hard-freeze them.
        return optax.multi_transform(
            {"__opt__": tx, "__frozen__": optax.set_to_zero()},
            lambda tree: jax.tree_util.tree_map_with_path(
                lambda path, _: ("__frozen__" if _is_ema_buffer(path)
                                 else "__opt__"), tree))

    transforms = {}
    prefixes = []
    for gname, gargs in groups.items():
        gargs = dict(gargs or {})
        # per-group overrides: optimizer name, scheduler, and zero-grad
        # skipping (the reference builds e.g. a separate prop-net
        # optimizer, systems/utils.py / nerf_volume_renderer.py:76-88). A
        # group with an explicit `name` is a STANDALONE optimizer spec:
        # it does NOT inherit the main optimizer's betas/eps/weight_decay.
        standalone = "name" in gargs
        g_opt_name = gargs.pop("name", name)
        g_sched = gargs.pop("scheduler", None)
        g_skip_zero = gargs.pop("skip_zero_grad", False)
        gall = gargs if standalone else {**args, **gargs}
        lr = gall.get("lr", args.get("lr", 1e-3))
        if g_sched is not None:
            lr_final = parse_scheduler(g_sched, lr) or lr
        else:
            lr_final = with_schedule(lr)
        tx_g = _make_single_optimizer(g_opt_name, lr_final, gall)
        if g_skip_zero:
            tx_g = _skip_when_all_grads_zero(tx_g)
        transforms[gname] = tx_g
        prefixes.append(gname)
    transforms["__frozen__"] = optax.set_to_zero()

    def label_fn(tree):
        def label_of(path):
            if _is_ema_buffer(path):
                return "__frozen__"
            dotted = _path_to_dotted(path)
            best = None
            for p in prefixes:
                if dotted == p or dotted.startswith(p + "."):
                    if best is None or len(p) > len(best):
                        best = p
            return best if best is not None else "__frozen__"

        return jax.tree_util.tree_map_with_path(
            lambda path, _: label_of(path), tree)

    return optax.multi_transform(transforms, label_fn)


def _skip_when_all_grads_zero(
        tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Freeze a transform on steps whose incoming grads are ALL zero.

    The reference steps its proposal-net optimizer only on requires_grad
    steps (nerfacc PropNetEstimator.update_every_n_steps); inside one
    jitted train step the gate zeroes the prop GRADS, but a bare optimizer
    would still decay momentum, apply weight decay, and advance its count
    on those steps. This wrapper makes a zero-grad step a true no-op:
    updates are zero and the inner state is carried over unchanged."""

    def init_fn(params):
        return tx.init(params)

    def update_fn(grads, state, params=None):
        flag = jnp.asarray(False)
        for g in jax.tree.leaves(grads):
            flag = jnp.logical_or(flag, jnp.any(g != 0))
        new_updates, new_state = tx.update(grads, state, params)
        updates = jax.tree.map(
            lambda u: jnp.where(flag, u, jnp.zeros_like(u)), new_updates)
        merged = jax.tree.map(lambda new, old: jnp.where(flag, new, old),
                              new_state, state)
        return updates, merged

    return optax.GradientTransformation(init_fn, update_fn)


def _is_ema_buffer(path) -> bool:
    """Out-of-band-updated buffers stored in params (w_avg EMA; see
    systems/base.py `_apply_w_avg_ema`)."""
    if not path:
        return False
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", None))
    return str(key if key is not None else last) == "w_avg"


def _scheduler_factor(cfg: Dict, base_lr: float):
    """cfg -> f(step) -> multiplicative lr factor, jnp-traceable.

    Mirrors the torch lr_scheduler names the reference resolves dynamically
    (threestudio/systems/utils.py:12-16,74-114), including the
    SequentialLR/ChainedScheduler composites. Factors are relative to the
    group's base lr so composition and per-group lrs work like torch."""
    name = str(cfg.get("name", "")).lower()
    args = dict(cfg.get("args", {}) or {})

    if name == "exponentiallr":
        gamma = float(args.get("gamma", 1.0))
        return lambda step: jnp.power(gamma, step)
    if name == "steplr":
        gamma = float(args.get("gamma", 0.1))
        size = int(args.get("step_size", 1))
        return lambda step: jnp.power(gamma, step // size)
    if name == "multisteplr":
        gamma = float(args.get("gamma", 0.1))
        milestones = jnp.asarray(sorted(args.get("milestones", [])),
                                 jnp.float32)
        return lambda step: jnp.power(gamma,
                                      jnp.sum(milestones <= step))
    if name == "linearlr":
        # torch defaults: start_factor=1/3, end_factor=1.0, total_iters=5
        start = float(args.get("start_factor", 1.0 / 3.0))
        end = float(args.get("end_factor", 1.0))
        total = max(1, int(args.get("total_iters", 5)))
        return lambda step: start + (end - start) * jnp.minimum(
            1.0, step / total)
    if name == "constantlr":
        factor = float(args.get("factor", 1.0 / 3.0))
        total = int(args.get("total_iters", 5))
        return lambda step: jnp.where(step < total, factor, 1.0)
    if name == "cosineannealinglr":
        # torch CosineAnnealingLR is PERIODIC (period 2*T_max): no clamp,
        # the lr rebounds toward base after T_max
        t_max = max(1, int(args.get("T_max", 1)))
        eta_min = float(args.get("eta_min", 0.0))
        fmin = eta_min / base_lr if base_lr else 0.0
        return lambda step: fmin + (1.0 - fmin) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * step / t_max))
    if name in ("sequentiallr", "sequential"):
        subs = [_scheduler_factor(dict(c), base_lr)
                for c in cfg.get("schedulers", [])]
        milestones = [int(m) for m in cfg.get("milestones", [])]
        assert len(milestones) == len(subs) - 1, (
            "SequentialLR needs len(milestones) == len(schedulers) - 1")
        starts = [0] + milestones

        def seq(step):
            # torch SequentialLR: each sub-scheduler restarts its own count
            vals = [f(jnp.maximum(step - s, 0)) for f, s in zip(subs,
                                                                starts)]
            idx = sum(jnp.asarray(step >= m, jnp.int32)
                      for m in milestones)
            return jnp.select([idx == i for i in range(len(subs))], vals)

        return seq
    if name == "chainedscheduler":
        subs = [_scheduler_factor(dict(c), base_lr)
                for c in cfg.get("schedulers", [])]

        def chained(step):
            out = subs[0](step)
            for f in subs[1:]:
                out = out * f(step)
            return out

        return chained
    raise ValueError(f"Unknown scheduler: {cfg.get('name')}")


def parse_scheduler(scheduler_cfg: Optional[Dict], base_lr: float):
    """`system.scheduler:` YAML -> optax schedule (step -> lr), or None.

    Parity: reference parse_scheduler (threestudio/systems/utils.py:74-114)
    resolves torch lr_scheduler classes by name, incl. SequentialLR /
    ChainedScheduler composites. Divergence: `interval: epoch` is applied
    per STEP with a warning — the trainer (like the reference's infinite
    iterable datasets, where PL epochs never complete) has no epoch axis.
    """
    if not scheduler_cfg:
        return None
    cfg = dict(scheduler_cfg)
    if cfg.get("interval", "epoch") == "epoch":
        import logging
        logging.getLogger(__name__).warning(
            "scheduler interval 'epoch' interpreted per STEP: the training "
            "loop is step-based (reference epochs never advance over "
            "infinite iterable datasets)")
    factor = _scheduler_factor(cfg, base_lr)
    return lambda step: base_lr * factor(step)
