"""ASD guidance + prompt processor tests (SURVEY.md §4a: ASD t+ schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.models.guidance.asd import (ASDConfig, asd_loss,
                                                  get_t_plus,
                                                  sample_timesteps)
from scaledreamer_tpu.models.guidance.schedule import (add_noise,
                                                       make_alphas_cumprod)
from scaledreamer_tpu.models.prompt_processors.base import (
    PromptProcessorOutput, direction_idx, shift_azimuth_deg)

sd.ensure_builtins()


def test_alphas_cumprod_sd21():
    a = make_alphas_cumprod()
    assert a.shape == (1000,)
    assert 0.998 < a[0] < 1.0
    assert a[-1] < 0.01
    assert np.all(np.diff(a) < 0)


def test_add_noise_interpolates():
    a = jnp.asarray(make_alphas_cumprod())
    x = jnp.ones((2, 4, 4, 4))
    eps = jnp.zeros_like(x)
    # zero noise: x_t = sqrt(abar)*x
    t = jnp.array([0, 999])
    out = add_noise(a, x, eps, t)
    assert np.allclose(np.asarray(out[0]), np.sqrt(a[0]), atol=1e-5)
    assert np.allclose(np.asarray(out[1]), np.sqrt(a[999]), atol=1e-5)


def test_t_plus_properties():
    cfg = ASDConfig(plus_ratio=0.1, plus_random=False)
    t = jnp.array([100, 500, 980])
    tp = get_t_plus(jax.random.PRNGKey(0), t, 20, cfg)
    # t+ = t + 0.1*(t-20)
    assert np.asarray(tp).tolist() == [108, 548, 999]  # clamped at 999
    # random variant: t <= t+ <= deterministic t+
    cfg_r = ASDConfig(plus_ratio=0.1, plus_random=True)
    tpr = get_t_plus(jax.random.PRNGKey(1), t, 20, cfg_r)
    assert (np.asarray(tpr) >= np.asarray(t)).all()
    assert (np.asarray(tpr) <= np.asarray(tp)).all()


def test_t_plus_headroom_preclamp_near_max_step():
    """Reference pre-clamps the shift to T-t-1 BEFORE random scaling
    (stable_diffusion_asd_guidance.py:300-304): with plus_random=True and t
    near 999 the shift distribution stays ~uniform over the headroom instead
    of piling mass at 999 through the final clip."""
    cfg = ASDConfig(plus_ratio=0.5, plus_random=True)
    t = jnp.full((20000,), 990, jnp.int32)
    tp = np.asarray(get_t_plus(jax.random.PRNGKey(0), t, 20, cfg))
    shift = tp - 990
    # headroom = 1000 - 990 - 1 = 9; raw shift 0.5*(990-20)=485 >> 9
    assert shift.min() >= 0 and shift.max() <= 9
    # uniform over [0,9): mean ~4.5 after floor -> ~4.0; mass at the top
    # bucket must be ~1/9, NOT a point mass (was >90% pre-fix)
    assert (shift == 9).mean() < 0.2
    assert abs(shift.mean() - 4.0) < 0.3


def test_timestep_sampling_bounds():
    t = sample_timesteps(jax.random.PRNGKey(0), 512, 20, 980)
    assert int(t.min()) >= 20 and int(t.max()) <= 980


def test_asd_loss_gradient_matches_grad():
    """Reparam trick: d loss / d latents == w*(eps_cfg - eps_second)."""
    a = jnp.asarray(make_alphas_cumprod())
    B = 2
    latents = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 4))
    emb = jax.random.normal(jax.random.PRNGKey(1), (3 * B, 7, 16))

    def eps_model(l, t, e):
        # deterministic fake unet: eps depends on embedding mean
        return l * 0.1 + jnp.mean(e, axis=(1, 2)).reshape(-1, 1, 1, 1)

    cfg = ASDConfig(guidance_scale=7.5, plus_ratio=0.1, plus_random=False)

    def f(lat):
        loss, _ = asd_loss(jax.random.PRNGKey(2), lat, a, emb, None,
                           eps_model, cfg, 20, 980)
        return loss

    g = jax.grad(f)(latents)
    assert g.shape == latents.shape
    assert np.abs(np.asarray(g)).max() > 0


def test_direction_idx():
    elevation = jnp.array([0.0, 0.0, 0.0, 70.0, 0.0])
    azimuth = jnp.array([90.0, 0.0, 180.0, 0.0, -170.0])
    idx = direction_idx(elevation, azimuth, 60.0, 45.0, 45.0)
    # side, front, back, overhead, back
    assert np.asarray(idx).tolist() == [0, 1, 2, 3, 2]


def test_shift_azimuth():
    assert float(shift_azimuth_deg(jnp.array(270.0))) == -90.0
    assert float(shift_azimuth_deg(jnp.array(-190.0))) == 170.0


def _mk_prompt_output(use_perp_neg=True, C=8):
    rng = np.random.default_rng(0)
    vd = jnp.asarray(rng.standard_normal((4, 7, C)).astype(np.float32))
    uncond_vd = jnp.asarray(rng.standard_normal((4, 7, C)).astype(np.float32))
    return PromptProcessorOutput(
        text_embeddings=vd[0], uncond_text_embeddings=uncond_vd[0],
        text_embeddings_vd=vd, uncond_text_embeddings_vd=uncond_vd,
        use_perp_neg=use_perp_neg,
        perp_neg_f_sb=(1, 0.5, -0.606), perp_neg_f_fsb=(1, 0.5, 0.967),
        perp_neg_f_fs=(4, 0.5, -2.426), perp_neg_f_sf=(4, 0.5, -2.426),
        prompt="p", prompts_vd=["a", "b", "c", "d"])


def test_get_text_embeddings_layout():
    po = _mk_prompt_output()
    elevation = jnp.array([0.0, 70.0])
    azimuth = jnp.array([0.0, 0.0])
    dist = jnp.ones(2)
    emb = po.get_text_embeddings(elevation, azimuth, dist, True)
    assert emb.shape == (4, 7, 8)  # [cond(2), uncond(2)]
    # sample 0 is front (idx 1), sample 1 overhead (idx 3)
    assert np.allclose(emb[0], po.text_embeddings_vd[1])
    assert np.allclose(emb[1], po.text_embeddings_vd[3])
    assert np.allclose(emb[2], po.uncond_text_embeddings_vd[1])


def test_perp_neg_embeddings_front_view():
    po = _mk_prompt_output()
    elevation = jnp.array([0.0])
    azimuth = jnp.array([0.0])  # pure front: r_inter = 1
    dist = jnp.ones(1)
    emb, w = po.get_text_embeddings_perp_neg(elevation, azimuth, dist, True)
    assert emb.shape == (4, 7, 8)  # pos(1) + uncond(1) + negs(2)
    # pure front: pos == front embedding
    assert np.allclose(np.asarray(emb[0]), po.text_embeddings_vd[1], atol=1e-5)
    # f_fs(r=1) = 4*exp(-0.5)+(-2.426) ~ 0 -> w0 ~ 0
    assert abs(float(w[0, 0])) < 0.01
    # w1 = -f_sf(0) = -(4*1 - 2.426) = -1.574
    assert float(w[0, 1]) == pytest.approx(-(4 * 1 - 2.426), abs=1e-3)


def test_perp_neg_embeddings_side_view():
    po = _mk_prompt_output()
    emb, w = po.get_text_embeddings_perp_neg(
        jnp.array([0.0]), jnp.array([90.0]), jnp.ones(1), True)
    # |azi|=90 -> side-back zone, r = 1 -> pos = side
    assert np.allclose(np.asarray(emb[0]), po.text_embeddings_vd[0], atol=1e-5)
    # w0 = -f_sb(1) = -(exp(-0.5) - 0.606) ~ -0.0005
    assert abs(float(w[0, 0])) < 0.01


def test_perp_neg_overhead_zero_weights():
    po = _mk_prompt_output()
    emb, w = po.get_text_embeddings_perp_neg(
        jnp.array([80.0]), jnp.array([0.0]), jnp.ones(1), True)
    assert np.allclose(np.asarray(w), 0.0)
    assert np.allclose(np.asarray(emb[0]), po.text_embeddings_vd[3], atol=1e-5)


def test_dummy_prompt_processor_roundtrip(tmp_path):
    P = sd.find("dummy-prompt-processor")
    p = P(cfg=parse_structured(P.Config, {
        "prompt": "a test prompt", "n_ctx": 7, "n_dim": 8,
        "cache_dir": str(tmp_path)}))
    out = p()
    assert out.text_embeddings.shape == (7, 8)
    assert out.text_embeddings_vd.shape == (4, 7, 8)
    # deterministic: re-instantiating gives the same embeddings
    p2 = P(cfg=parse_structured(P.Config, {
        "prompt": "a test prompt", "n_ctx": 7, "n_dim": 8,
        "cache_dir": str(tmp_path)}))
    assert np.allclose(np.asarray(p2().text_embeddings),
                       np.asarray(out.text_embeddings))


def test_dummy_guidance_pulls_toward_target():
    G = sd.find("dummy-guidance")
    g = G(cfg=parse_structured(G.Config, {"target_color": (1.0, 0.0, 0.0)}))

    rgb = jnp.full((1, 4, 4, 3), 0.5)

    def f(x):
        return g({}, jax.random.PRNGKey(0), x)["loss_asd"]

    grad = np.asarray(jax.grad(f)(rgb))
    # gradient pushes red channel up (negative grad on red), others down
    assert (grad[..., 0] < 0).all()
    assert (grad[..., 1] > 0).all()
