"""Golden-test the MVDream LDM checkpoint conversion + Flax multiview UNet
against a torch mirror with the vendored model's exact key layout
(reference extern/mvdream/ldm/..., scripts/convert_mvdream_checkpoint.py)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_mvdream_reference import TorchMultiViewUNet  # noqa: E402

from scaledreamer_tpu.models.diffusion.unet import (UNet2DConditionModel,
                                                    UNetConfig)


def _load_converter():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "convert_mvdream_checkpoint.py")
    spec = importlib.util.spec_from_file_location("convert_mv", path)
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
def mv_pair():
    conv = _load_converter()
    torch.manual_seed(0)
    tmodel = TorchMultiViewUNet(
        block_out_channels=(32, 32, 64, 64), layers_per_block=2,
        context_dim=48, head_dim=8, camera_dim=16, num_frames=4).eval()
    # wrap into the .pt state-dict layout the converter expects
    state = {"model.diffusion_model." + k: v.detach().numpy()
             for k, v in tmodel.state_dict().items()}
    params = conv.convert_state_dicts(state)

    cfg = UNetConfig(block_out_channels=(32, 32, 64, 64),
                     layers_per_block=2, cross_attention_dim=48,
                     attention_head_dim=8, num_frames=4, camera_dim=16,
                     dtype=jnp.float32)
    fmodel = UNet2DConditionModel(cfg)
    return tmodel, fmodel, params["unet"]


def test_mvdream_conversion_covers_every_param(mv_pair):
    tmodel, fmodel, flax_tree = mv_pair
    x = jnp.zeros((4, 16, 16, 4))
    t = jnp.zeros((4,), jnp.int32)
    ctx = jnp.zeros((4, 7, 48))
    cam = jnp.zeros((4, 16))
    init = fmodel.init(jax.random.PRNGKey(0), x, t, ctx, camera=cam)["params"]
    got = _tree_shapes(flax_tree)
    want = _tree_shapes(init)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"missing: {sorted(missing)[:8]}"
    assert not extra, f"extra: {sorted(extra)[:8]}"
    assert all(want[k] == got[k] for k in want), [
        (k, want[k], got[k]) for k in want if want[k] != got[k]][:8]


def test_mvdream_eps_parity_torch_vs_flax(mv_pair):
    """Output parity incl. the camera-embed path and the cross-view
    3D self-attention (mvdream attention.py:343-411): changing one view's
    latent must change OTHER views' outputs, identically in both."""
    tmodel, fmodel, flax_tree = mv_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 4, 16, 16)).astype(np.float32)
    t = np.full((4,), 321, np.int64)
    ctx = rng.standard_normal((4, 7, 48)).astype(np.float32)
    cam = rng.standard_normal((4, 16)).astype(np.float32)

    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(ctx), torch.from_numpy(cam)).numpy()
    out_f = fmodel.apply({"params": flax_tree},
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(ctx),
                         camera=jnp.asarray(cam))
    out_f = np.asarray(out_f).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_f, out_t, atol=3e-4, rtol=1e-3)

    # cross-view coupling: perturb view 0, expect view 3 output to move
    x2 = x.copy()
    x2[0] += 1.0
    with torch.no_grad():
        out_t2 = tmodel(torch.from_numpy(x2), torch.from_numpy(t),
                        torch.from_numpy(ctx),
                        torch.from_numpy(cam)).numpy()
    assert np.abs(out_t2[3] - out_t[3]).max() > 1e-6
