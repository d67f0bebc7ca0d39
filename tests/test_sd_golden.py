"""Golden-test the SD checkpoint conversion + Flax UNet/VAE forward against
an independent torch implementation with diffusers state-dict layout
(VERDICT r1 item 3 fallback: no real weights in the zero-egress image, so
goldens come from randomly-initialized torch with converted weights)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_sd_reference import TorchUNet, TorchVAEEncoder  # noqa: E402

from scaledreamer_tpu.models.diffusion.unet import (UNet2DConditionModel,
                                                    UNetConfig)
from scaledreamer_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig


def _load_converter():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "convert_sd_checkpoint.py")
    spec = importlib.util.spec_from_file_location("convert_sd", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


@pytest.fixture(scope="module")
def tiny_unet_pair():
    conv = _load_converter()
    torch.manual_seed(0)
    tmodel = TorchUNet(block_out_channels=(32, 32, 64, 64),
                       layers_per_block=2, cross_attention_dim=48,
                       attention_head_dim=8).eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flax_tree = conv.build_flax_tree(state, conv.convert_unet_key)

    cfg = UNetConfig(block_out_channels=(32, 32, 64, 64),
                     layers_per_block=2, cross_attention_dim=48,
                     attention_head_dim=8, dtype=jnp.float32)
    fmodel = UNet2DConditionModel(cfg)
    return tmodel, fmodel, flax_tree


def test_unet_conversion_covers_every_param(tiny_unet_pair):
    tmodel, fmodel, flax_tree = tiny_unet_pair
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 48))
    init = fmodel.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    got = _tree_shapes(flax_tree)
    want = _tree_shapes(init)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"converter missing params: {sorted(missing)[:8]}"
    assert not extra, f"converter produced unknown params: {sorted(extra)[:8]}"
    mismatched = {k for k in want if want[k] != got[k]}
    assert not mismatched, \
        f"shape mismatches: {[(k, want[k], got[k]) for k in list(mismatched)[:8]]}"


def test_unet_eps_parity_torch_vs_flax(tiny_unet_pair):
    """eps outputs must agree to fp32 numerical noise on fixed latents —
    the reference contract is the pretrained diffusers UNet (SURVEY §4b)."""
    tmodel, fmodel, flax_tree = tiny_unet_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    t = np.asarray([17, 503], np.int64)
    ctx = rng.standard_normal((2, 7, 48)).astype(np.float32)

    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(ctx)).numpy()

    out_f = fmodel.apply({"params": flax_tree},
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(ctx))
    out_f = np.asarray(out_f).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def tiny_vae_pair():
    conv = _load_converter()
    torch.manual_seed(1)
    tmodel = TorchVAEEncoder(block_out_channels=(32, 32, 64),
                             layers_per_block=1).eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # converter expects full-VAE keys; decoder keys are simply absent here
    flax_tree = conv.build_flax_tree(state, conv.convert_vae_key)
    cfg = VAEConfig(block_out_channels=(32, 32, 64), layers_per_block=1,
                    dtype=jnp.float32)
    fmodel = AutoencoderKL(cfg)
    return tmodel, fmodel, flax_tree


def test_vae_encoder_parity_torch_vs_flax(tiny_vae_pair):
    tmodel, fmodel, flax_tree = tiny_vae_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x)).numpy()

    variables = {"params": {"encoder": flax_tree["encoder"]}}
    mean, logvar = fmodel.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=fmodel.encode_moments)
    out_f = np.concatenate([np.asarray(mean), np.asarray(logvar)],
                           axis=-1).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_f, out_t, atol=2e-4, rtol=1e-3)
