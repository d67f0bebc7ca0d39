"""Architectural parity checks against the reference's pretrained models.

Without network egress we cannot golden-test activations, but parameter
COUNTS pin the architecture: SD2.1-base UNet is 865.91M params, its VAE
83.65M (diffusers model cards); MVDream sd-v2.1-base-4view = SD2.1 UNet +
camera-embedding MLP. Mismatched counts would make checkpoint conversion
impossible, so these tests guard the layer inventory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scaledreamer_tpu.models.diffusion.unet import (UNet2DConditionModel,
                                                    UNetConfig)
from scaledreamer_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig


def _count(shapes) -> int:
    return sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))


def test_sd21_unet_param_count():
    unet = UNet2DConditionModel(UNetConfig())
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 4), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1, 77, 1024), jnp.float32))
    n = _count(shapes["params"])
    # diffusers stabilityai/stable-diffusion-2-1-base unet: 865,910,724
    assert n == 865_910_724, f"UNet params {n:,} != 865,910,724"


def test_sd_vae_param_count():
    vae = AutoencoderKL(VAEConfig())
    shapes = jax.eval_shape(
        vae.init, {"params": jax.random.PRNGKey(0)},
        jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32),
        jax.random.PRNGKey(1))
    n = _count(shapes["params"])
    # diffusers SD VAE (kl-f8): 83,653,863
    assert n == 83_653_863, f"VAE params {n:,} != 83,653,863"


def test_mvdream_unet_param_count():
    """MVDream 4-view UNet = SD2.1 UNet + camera MLP (16->1280->1280)."""
    unet = UNet2DConditionModel(UNetConfig(num_frames=4, camera_dim=16))
    shapes = jax.eval_shape(
        lambda k, a, b, c, d: unet.init(k, a, b, c, camera=d),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((4, 32, 32, 4), jnp.float32),
        jax.ShapeDtypeStruct((4,), jnp.int32),
        jax.ShapeDtypeStruct((4, 77, 1024), jnp.float32),
        jax.ShapeDtypeStruct((4, 16), jnp.float32))
    n = _count(shapes["params"])
    camera_mlp = 16 * 1280 + 1280 + 1280 * 1280 + 1280
    assert n == 865_910_724 + camera_mlp, \
        f"MVDream UNet params {n:,} != SD2.1 + camera MLP"


def test_adan_matches_reference_math():
    """Adan step vs a NumPy transcription of the reference update
    (threestudio/systems/optimizers.py:152-254, no_prox=False)."""
    import optax
    from scaledreamer_tpu.systems.optimizers import adan

    lr, b1, b2, b3, eps, wd = 0.01, 0.9, 0.8, 0.95, 1e-8, 0.02
    tx = adan(lr, b1=b1, b2=b2, b3=b3, eps=eps, weight_decay=wd)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((5,)).astype(np.float32))
    state = tx.init(p)

    # reference state
    m = np.zeros(5); v = np.zeros(5); n_ = np.zeros(5)
    prev_g = None
    p_ref = np.asarray(p, np.float64)

    for step in range(1, 4):
        g_np = rng.standard_normal(5).astype(np.float32)
        g = jnp.asarray(g_np)
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)

        gd = g_np.astype(np.float64)
        diff = np.zeros(5) if prev_g is None else gd - prev_g
        prev_g = gd
        bc1 = 1 - b1 ** step
        bc2 = 1 - b2 ** step
        bc3 = 1 - b3 ** step
        m = b1 * m + (1 - b1) * gd
        v = b2 * v + (1 - b2) * diff
        # transcribed from reference _single_tensor_adan
        # (threestudio/systems/optimizers.py:252-278):
        # neg_grad_or_diff.mul_(b2).add_(grad) -> g + b2*diff;
        # step sizes lr/bc1 and lr*b2/bc2.
        upd = gd + b2 * diff
        n_ = b3 * n_ + (1 - b3) * upd * upd
        denom = np.sqrt(n_ / bc3) + eps
        update = (m / bc1 + b2 * v / bc2) / denom
        p_ref = (p_ref - lr * update) / (1 + lr * wd)

    assert np.allclose(np.asarray(p), p_ref, atol=1e-5), \
        f"{np.asarray(p)} vs {p_ref}"


def test_per_module_param_groups_freeze_unlisted():
    import optax
    from scaledreamer_tpu.systems.optimizers import parse_optimizer

    params = {"geometry": {"encoding": {"w": jnp.ones(3)},
                           "net": {"w": jnp.ones(3)}},
              "background": {"w": jnp.ones(3)}}
    tx = parse_optimizer({
        "name": "Adam", "args": {"lr": 0.1},
        "params": {"geometry.encoding": {"lr": 1.0}}}, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # listed subtree moves, unlisted are frozen (reference utils.py:34-53)
    assert float(jnp.abs(updates["geometry"]["encoding"]["w"]).sum()) > 0
    assert float(jnp.abs(updates["geometry"]["net"]["w"]).sum()) == 0
    assert float(jnp.abs(updates["background"]["w"]).sum()) == 0

def test_scheduler_changes_lr_over_steps():
    """system.scheduler YAML wiring: the effective lr follows the schedule
    (reference parse_scheduler, threestudio/systems/utils.py:74-114)."""
    from scaledreamer_tpu.systems.optimizers import parse_optimizer

    params = {"w": jnp.ones(4)}
    grads = {"w": jnp.ones(4)}
    tx = parse_optimizer(
        {"name": "SGD", "args": {"lr": 1.0}}, params,
        scheduler_cfg={"name": "ExponentialLR", "interval": "step",
                       "args": {"gamma": 0.5}})
    state = tx.init(params)
    # SGD update = -lr(step) * grad; lr halves each step
    u0, state = tx.update(grads, state, params)
    u1, state = tx.update(grads, state, params)
    u2, state = tx.update(grads, state, params)
    assert np.allclose(np.asarray(u0["w"]), -1.0)
    assert np.allclose(np.asarray(u1["w"]), -0.5)
    assert np.allclose(np.asarray(u2["w"]), -0.25)


def test_scheduler_applies_to_param_groups_and_adan():
    from scaledreamer_tpu.systems.optimizers import parse_optimizer

    params = {"geometry": {"w": jnp.ones(3)}, "background": {"w": jnp.ones(3)}}
    grads = jax.tree.map(jnp.ones_like, params)
    tx = parse_optimizer(
        {"name": "Adan", "args": {"lr": 1e-2},
         "params": {"geometry": {"lr": 1e-2}, "background": {"lr": 1e-3}}},
        params,
        scheduler_cfg={"name": "LinearLR", "interval": "step",
                       "args": {"start_factor": 0.1, "end_factor": 1.0,
                                "total_iters": 10}})
    state = tx.init(params)
    u0, state = tx.update(grads, state, params)
    for _ in range(12):
        u_last, state = tx.update(grads, state, params)
    # warmup: step-0 update is ~10x smaller than post-warmup (Adan moment
    # bias corrections are step-dependent, so allow slack)
    r = (np.abs(np.asarray(u_last["geometry"]["w"])).mean()
         / np.abs(np.asarray(u0["geometry"]["w"])).mean())
    assert r > 5.0, r
    # per-group base lrs keep their ratio under the shared schedule factor
    ratio = (np.abs(np.asarray(u_last["geometry"]["w"])).mean()
             / np.abs(np.asarray(u_last["background"]["w"])).mean())
    assert 5.0 < ratio < 20.0, ratio


def test_scheduler_sequential_and_multistep():
    from scaledreamer_tpu.systems.optimizers import parse_scheduler

    sched = parse_scheduler(
        {"name": "SequentialLR", "interval": "step",
         "milestones": [5],
         "schedulers": [
             {"name": "ConstantLR", "args": {"factor": 0.5,
                                             "total_iters": 100}},
             {"name": "MultiStepLR", "args": {"gamma": 0.1,
                                              "milestones": [3]}}]},
        base_lr=1.0)
    assert np.isclose(float(sched(0)), 0.5)
    assert np.isclose(float(sched(4)), 0.5)
    # after milestone 5 the MultiStep scheduler restarts its own count
    assert np.isclose(float(sched(5)), 1.0)
    assert np.isclose(float(sched(7)), 1.0)
    assert np.isclose(float(sched(8)), 0.1)  # 8-5=3 hits the sub-milestone


def test_scheduler_unknown_name_raises():
    import pytest
    from scaledreamer_tpu.systems.optimizers import parse_scheduler
    with pytest.raises(ValueError, match="Unknown scheduler"):
        parse_scheduler({"name": "NoSuchLR"}, base_lr=1.0)

def test_skip_zero_grad_group_freezes_on_gated_steps():
    """prop_net group parity with the reference's separate optimizer: a
    zero-grad (gated-off) step is a TRUE no-op — no momentum decay, no
    weight-decay drift, no count advance."""
    from scaledreamer_tpu.systems.optimizers import parse_optimizer

    params = {"prop_net": {"w": jnp.ones(3)}, "geometry": {"w": jnp.ones(3)}}
    tx = parse_optimizer(
        {"name": "AdamW", "args": {"lr": 0.1, "weight_decay": 0.1},
         "params": {"geometry": {},
                    "prop_net": {"name": "Adam", "lr": 0.01,
                                 "skip_zero_grad": True}}}, params)
    state = tx.init(params)
    g_active = jax.tree.map(jnp.ones_like, params)
    g_gated = {"prop_net": {"w": jnp.zeros(3)},
               "geometry": {"w": jnp.ones(3)}}

    u1, state_a = tx.update(g_active, state, params)
    assert float(jnp.abs(u1["prop_net"]["w"]).sum()) > 0

    # gated step: prop update exactly zero (AdamW momentum/wd would
    # otherwise still move it), geometry still updates
    u0, state_b = tx.update(g_gated, state_a, params)
    assert float(jnp.abs(u0["prop_net"]["w"]).sum()) == 0.0
    assert float(jnp.abs(u0["geometry"]["w"]).sum()) > 0

    # the gated step left the prop inner state untouched: an active step
    # now gives the same update as one taken directly after state_a
    u_direct, _ = tx.update(g_active, state_a, params)
    u_resumed, _ = tx.update(g_active, state_b, params)
    assert np.allclose(np.asarray(u_direct["prop_net"]["w"]),
                       np.asarray(u_resumed["prop_net"]["w"]))


def test_standalone_group_does_not_inherit_main_args():
    """A group with an explicit `name` is a standalone optimizer spec: it
    must not inherit the main optimizer's weight_decay/betas."""
    from scaledreamer_tpu.systems.optimizers import parse_optimizer

    params = {"a": jnp.ones(4)}
    grads = {"a": jnp.zeros(4)}  # zero grads isolate the decay term
    # main AdamW with huge weight decay; group spec = plain Adam (no wd)
    tx = parse_optimizer(
        {"name": "AdamW", "args": {"lr": 0.1, "weight_decay": 10.0},
         "params": {"a": {"name": "Adam", "lr": 0.1}}}, params)
    state = tx.init(params)
    u, _ = tx.update(grads, state, params)
    # inherited weight decay would give a nonzero decay update
    assert float(jnp.abs(u["a"]).max()) < 1e-6


def test_cosine_annealing_is_periodic():
    from scaledreamer_tpu.systems.optimizers import parse_scheduler
    sched = parse_scheduler(
        {"name": "CosineAnnealingLR", "interval": "step",
         "args": {"T_max": 10, "eta_min": 0.0}}, base_lr=1.0)
    assert np.isclose(float(sched(0)), 1.0)
    assert np.isclose(float(sched(10)), 0.0, atol=1e-6)
    assert np.isclose(float(sched(20)), 1.0)  # torch rebound, no clamp
