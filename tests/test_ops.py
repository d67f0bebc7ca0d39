"""Tests for math/hashgrid/network/render ops (SURVEY.md §4a invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scaledreamer_tpu.ops.hashgrid import (
    HashGridConfig, hashgrid_encode, init_hashgrid, progressive_level_mask)
from scaledreamer_tpu.ops.math import (
    contract_to_unisphere, get_activation, perpendicular_component,
    scale_tensor, trunc_exp)
from scaledreamer_tpu.ops.networks import (
    SphereInitVanillaMLP, VanillaMLP, frequency_mask, get_encoding, get_mlp)
from scaledreamer_tpu.ops.render import (
    accumulate_along_rays, importance_sampling, neus_alpha,
    rays_intersect_bbox, render_weights_from_alpha,
    render_weights_from_density, sample_pdf, transmittance_from_density,
    volsdf_density)


# ---------------------------------------------------------------- math ops
def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.array([0.0, 1.0, 20.0])
    assert jnp.allclose(trunc_exp(x), jnp.exp(x))
    g = jax.grad(lambda v: trunc_exp(v))(25.0)
    assert jnp.isfinite(g)
    assert g == pytest.approx(np.exp(15.0), rel=1e-4)


def test_perpendicular_component():
    x = jnp.array([[1.0, 1.0, 0.0]])
    y = jnp.array([[1.0, 0.0, 0.0]])
    p = perpendicular_component(x, y)
    assert jnp.allclose(p, jnp.array([[0.0, 1.0, 0.0]]), atol=1e-6)
    assert jnp.allclose(jnp.sum(p * y), 0.0, atol=1e-6)


def test_scale_tensor():
    x = jnp.array([0.0, 0.5, 1.0])
    out = scale_tensor(x, (0.0, 1.0), (-1.0, 1.0))
    assert jnp.allclose(out, jnp.array([-1.0, 0.0, 1.0]))


def test_contract_to_unisphere_bounded():
    bbox = jnp.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    x = jnp.array([[0.0, 0.0, 0.0], [2.0, 2.0, 2.0]])
    out = contract_to_unisphere(x, bbox)
    assert jnp.allclose(out, jnp.array([[0.5, 0.5, 0.5], [1.0, 1.0, 1.0]]))


def test_activation_registry():
    assert get_activation("sigmoid")(jnp.array(0.0)) == 0.5
    assert get_activation("scale_2.0")(jnp.array(3.0)) == 6.0
    assert get_activation(None)(jnp.array(7.0)) == 7.0
    assert get_activation("clamp_0_1")(jnp.array(5.0)) == 1.0


# ---------------------------------------------------------------- hashgrid
def test_hashgrid_shapes_and_determinism(jax_key):
    cfg = HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)
    table = init_hashgrid(jax_key, cfg)
    assert table.shape == (4, 1024, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    y1 = hashgrid_encode(table, x, cfg)
    y2 = hashgrid_encode(table, x, cfg)
    assert y1.shape == (17, 8)
    assert jnp.allclose(y1, y2)


def test_hashgrid_interpolation_continuity(jax_key):
    """Encoding is continuous: nearby points give nearby features."""
    cfg = HashGridConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4)
    table = init_hashgrid(jax_key, cfg)
    x = jnp.array([[0.3, 0.4, 0.5]])
    eps = 1e-5
    y0 = hashgrid_encode(table, x, cfg)
    y1 = hashgrid_encode(table, x + eps, cfg)
    assert jnp.max(jnp.abs(y1 - y0)) < 1e-3


def test_hashgrid_dense_level_exact_at_vertices(jax_key):
    """On dense (collision-free) levels, encoding at a grid vertex equals the
    stored feature exactly."""
    cfg = HashGridConfig(n_levels=1, log2_hashmap_size=10, base_resolution=4,
                         per_level_scale=1.0)
    table = init_hashgrid(jax_key, cfg)
    # vertex (1,2,3) of a res-4 grid: x = (1/4, 2/4, 3/4)
    x = jnp.array([[0.25, 0.5, 0.75]])
    y = hashgrid_encode(table, x, cfg)
    stride = 5
    idx = (1 * stride + 2) * stride + 3
    assert jnp.allclose(y[0], table[0, idx], atol=1e-6)


def test_hashgrid_gradients_flow(jax_key):
    cfg = HashGridConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4)
    table = init_hashgrid(jax_key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 3))

    def loss(t):
        return jnp.sum(hashgrid_encode(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert jnp.abs(g).sum() > 0


def test_hashgrid_compute_x_grad_flag(jax_key):
    """compute_x_grad=False must leave TABLE gradients bit-identical (both
    encode and fused encode+grad) and zero the x cotangent; positions never
    carry gradients in the framework's query paths (see HashGridConfig)."""
    import dataclasses

    from scaledreamer_tpu.ops.hashgrid import hashgrid_encode_with_grad

    cfg_on = HashGridConfig(n_levels=3, log2_hashmap_size=8,
                            base_resolution=4, compute_x_grad=True)
    cfg_off = dataclasses.replace(cfg_on, compute_x_grad=False)
    table = init_hashgrid(jax_key, cfg_on)
    x = jax.random.uniform(jax.random.PRNGKey(3), (17, 3))

    for fn in (lambda t, x_, c: jnp.sum(hashgrid_encode(t, x_, c) ** 2),
               lambda t, x_, c: sum(jnp.sum(o ** 2) for o in
                                    hashgrid_encode_with_grad(t, x_, c))):
        gt_on, gx_on = jax.grad(lambda t, x_: fn(t, x_, cfg_on),
                                argnums=(0, 1))(table, x)
        gt_off, gx_off = jax.grad(lambda t, x_: fn(t, x_, cfg_off),
                                  argnums=(0, 1))(table, x)
        np.testing.assert_array_equal(np.asarray(gt_on), np.asarray(gt_off))
        assert np.abs(np.asarray(gx_on)).sum() > 0   # real x-grads when on
        assert np.abs(np.asarray(gx_off)).sum() == 0  # zeroed when off


def test_hashgrid_simplex_interpolation():
    """Simplex (4-corner Kuhn-tet) interpolation: continuous across cell &
    simplex boundaries, exact at grid vertices, and the custom-VJP grads
    match autodiff of the straight-line implementation."""
    import dataclasses

    from scaledreamer_tpu.ops.hashgrid import (_encode_impl,
                                               hashgrid_encode_with_grad)

    cfg = HashGridConfig(n_levels=2, log2_hashmap_size=10, base_resolution=4,
                         per_level_scale=1.5, interpolation="Simplex",
                         compute_x_grad=True)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4  # O(1) values

    # exact at grid vertices of the dense level 0 (res=4)
    v = jnp.asarray([[0.25, 0.5, 0.75]])
    enc = hashgrid_encode(table, v, cfg)
    res0 = 4
    stride = res0 + 1
    gi = np.asarray([1, 2, 3])
    row = (gi[0] * stride + gi[1]) * stride + gi[2]
    np.testing.assert_allclose(np.asarray(enc[0, :2]),
                               np.asarray(table[0, row]), atol=1e-5)

    # continuity: approach a random interior point from both sides
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(0.1, 0.9, (50, 3)).astype(np.float32))
    eps = 1e-4
    for d in (jnp.asarray([eps, 0, 0]), jnp.asarray([eps, eps, eps])):
        e1 = hashgrid_encode(table, p - d, cfg)
        e2 = hashgrid_encode(table, p + d, cfg)
        assert float(jnp.abs(e2 - e1).max()) < 0.1  # ~Lipschitz * 2eps * res

    # custom-VJP table gradient == autodiff of the plain implementation
    x = jnp.asarray(rng.uniform(0.05, 0.95, (31, 3)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal(
        (31, cfg.n_output_dims)).astype(np.float32))

    def loss_custom(t):
        return jnp.sum(hashgrid_encode(t, x, cfg) * co)

    def loss_plain(t):
        return jnp.sum(_encode_impl(t, x, cfg, None) * co)

    g_c = jax.grad(loss_custom)(table)
    g_p = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p),
                               atol=1e-4, rtol=1e-4)

    # fused encode+grad: denc matches finite differences of enc
    x1 = jnp.asarray([[0.312, 0.477, 0.651]])
    enc0, denc = hashgrid_encode_with_grad(table, x1, cfg)
    h = 1e-4
    for axis in range(3):
        dv = jnp.zeros((1, 3)).at[0, axis].set(h)
        fd = (hashgrid_encode(table, x1 + dv, cfg)
              - hashgrid_encode(table, x1 - dv, cfg)) / (2 * h)
        np.testing.assert_allclose(np.asarray(denc[axis, 0]),
                                   np.asarray(fd[0]), atol=2e-2, rtol=2e-2)


def test_hashgrid_dense_cell_packing_matches_unpacked():
    """dense_cell_packing (1 gathered row/point for dense levels) must be
    numerically identical to the unpacked path: encode, fused encode+grad,
    table gradients and x gradients, for both interpolations."""
    import dataclasses

    from scaledreamer_tpu.ops.hashgrid import hashgrid_encode_with_grad

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (41, 3)).astype(np.float32))
    for interp in ("Linear", "Simplex"):
        # res 4, 6, 9: all dense at 2^10 -> packing covers every level
        cfg0 = HashGridConfig(n_levels=3, log2_hashmap_size=10,
                              base_resolution=4, per_level_scale=1.5,
                              interpolation=interp, compute_x_grad=True,
                              dense_cell_packing=False)
        cfg1 = dataclasses.replace(cfg0, dense_cell_packing=True)
        table = init_hashgrid(jax.random.PRNGKey(1), cfg0) * 1e4
        e0 = hashgrid_encode(table, x, cfg0)
        e1 = hashgrid_encode(table, x, cfg1)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                                   rtol=1e-5, atol=1e-5, err_msg=interp)
        (enc0, d0) = hashgrid_encode_with_grad(table, x, cfg0)
        (enc1, d1) = hashgrid_encode_with_grad(table, x, cfg1)
        np.testing.assert_allclose(np.asarray(enc1), np.asarray(enc0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=1e-4, atol=1e-3)

        co = jnp.asarray(rng.standard_normal(
            (41, cfg0.n_output_dims)).astype(np.float32))

        def loss(t, x_, c):
            enc, denc = hashgrid_encode_with_grad(t, x_, c)
            return jnp.sum(enc * co) + jnp.sum(denc ** 2) * 1e-4

        gt0, gx0 = jax.grad(lambda t, x_: loss(t, x_, cfg0),
                            argnums=(0, 1))(table, x)
        gt1, gx1 = jax.grad(lambda t, x_: loss(t, x_, cfg1),
                            argnums=(0, 1))(table, x)
        np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt0),
                                   rtol=1e-4, atol=1e-4, err_msg=interp)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   rtol=1e-3, atol=1e-2, err_msg=interp)


def test_progressive_level_mask():
    cfg = HashGridConfig(n_levels=8)
    m = progressive_level_mask(cfg, 0, start_level=4, start_step=0,
                               update_steps=100)
    assert m.sum() == 4
    m = progressive_level_mask(cfg, 250, start_level=4, start_step=0,
                               update_steps=100)
    assert m.sum() == 6
    m = progressive_level_mask(cfg, 10000, 4, 0, 100)
    assert m.sum() == 8


# ---------------------------------------------------------------- networks
def test_vanilla_mlp_shapes(jax_key):
    mlp = VanillaMLP(dim_out=4, n_neurons=16, n_hidden_layers=2)
    x = jnp.ones((7, 8))
    params = mlp.init(jax_key, x)
    y = mlp.apply(params, x)
    assert y.shape == (7, 4)
    # bias-free
    flat = jax.tree_util.tree_leaves(params)
    assert all(p.ndim == 2 for p in flat)


def test_sphere_init_mlp_is_approx_sphere_sdf(jax_key):
    """Geometric init: output(x) ~ |x| - r for xyz-leading inputs."""
    mlp = SphereInitVanillaMLP(dim_out=1, n_neurons=64, n_hidden_layers=2,
                               sphere_init_radius=0.5)
    pts = np.random.default_rng(0).uniform(-1, 1, (256, 3)).astype(np.float32)
    x = jnp.concatenate([jnp.asarray(pts), jnp.zeros((256, 13))], axis=-1)
    params = mlp.init(jax_key, x)
    sdf = np.asarray(mlp.apply(params, x))[:, 0]
    expected = np.linalg.norm(pts, axis=-1) - 0.5
    corr = np.corrcoef(sdf, expected)[0, 1]
    assert corr > 0.9
    assert np.abs(sdf - expected).mean() < 0.25


def test_get_mlp_factory(jax_key):
    m = get_mlp(3, {"otype": "VanillaMLP", "n_neurons": 8,
                    "n_hidden_layers": 1})
    assert isinstance(m, VanillaMLP)
    m = get_mlp(1, {"otype": "SphereInitVanillaMLP", "n_neurons": 8,
                    "n_hidden_layers": 1, "sphere_init_radius": 0.5,
                    "inside_out": False})
    assert isinstance(m, SphereInitVanillaMLP)


def test_encoding_factory_hashgrid(jax_key):
    enc = get_encoding(3, {"otype": "HashGrid", "n_levels": 4,
                           "n_features_per_level": 2,
                           "log2_hashmap_size": 8, "base_resolution": 4,
                           "per_level_scale": 1.5, "include_xyz": True})
    assert enc.n_output_dims == 3 + 8
    x = jnp.full((5, 3), 0.5)
    params = enc.init(jax_key, x)
    y = enc.apply(params, x)
    assert y.shape == (5, 11)
    # include_xyz prefix: x*2-1 = 0
    assert jnp.allclose(y[:, :3], 0.0, atol=1e-6)


def test_frequency_encoding_and_mask(jax_key):
    enc = get_encoding(3, {"otype": "ProgressiveBandFrequency",
                           "n_frequencies": 4})
    x = jnp.zeros((2, 3))
    params = enc.init(jax_key, x)
    y = enc.apply(params, x)
    assert y.shape == (2, 24)
    m = frequency_mask(4, 100, 0)
    assert m[0] == 0.0
    m = frequency_mask(4, 100, 100)
    assert np.allclose(m, 1.0)


# ---------------------------------------------------------------- rendering
def test_transmittance_analytic():
    """Constant density sigma: T(t) = exp(-sigma * t)."""
    R, S = 4, 64
    t = jnp.linspace(0.0, 1.0, S + 1)
    t_starts = jnp.broadcast_to(t[:-1], (R, S))
    t_ends = jnp.broadcast_to(t[1:], (R, S))
    sigma = jnp.full((R, S), 3.0)
    trans = transmittance_from_density(t_starts, t_ends, sigma)
    expected = jnp.exp(-3.0 * t_starts)
    assert jnp.allclose(trans, expected, atol=1e-5)


def test_weights_sum_to_opacity():
    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.uniform(0, 1, (8, 32)).astype(np.float32))
    w = render_weights_from_alpha(alpha)
    opacity = accumulate_along_rays(w)
    # opacity = 1 - prod(1-alpha)
    expected = 1.0 - jnp.prod(1.0 - alpha + 1e-10, axis=-1, keepdims=True)
    assert jnp.allclose(opacity, expected, atol=1e-4)
    assert (np.asarray(w) >= 0).all()


def test_weights_from_density_opaque_wall():
    """A slab of very high density absorbs everything at first samples."""
    R, S = 2, 32
    t = jnp.linspace(0.0, 2.0, S + 1)
    t_starts = jnp.broadcast_to(t[:-1], (R, S))
    t_ends = jnp.broadcast_to(t[1:], (R, S))
    sigma = jnp.zeros((R, S)).at[:, 10:].set(1e4)
    w, _ = render_weights_from_density(t_starts, t_ends, sigma)
    depth = accumulate_along_rays(w, ((t_starts + t_ends) / 2)[..., None])
    assert np.allclose(np.asarray(depth), (t[10] + t[11]) / 2, atol=0.05)
    assert np.asarray(accumulate_along_rays(w)) == pytest.approx(1.0, abs=1e-4)


def test_sample_pdf_uniform_cdf():
    svals = jnp.broadcast_to(jnp.array([0.0, 1.0]), (3, 2))
    cdfs = svals
    out = sample_pdf(svals, cdfs, 4, None, stratified=False)
    assert out.shape == (3, 5)
    assert np.allclose(np.asarray(out[0]), np.linspace(0, 1 - 1e-4, 5), atol=1e-5)


def test_sample_pdf_concentrates_where_cdf_rises():
    # CDF flat then jumps: all samples should land in the jump region
    svals = jnp.broadcast_to(jnp.linspace(0, 1, 11), (1, 11))
    cdf = jnp.zeros((1, 11)).at[:, 8:].set(jnp.array([0.5, 0.9, 1.0]))
    out = sample_pdf(svals, cdf, 16, jax.random.PRNGKey(0), stratified=True)
    assert (np.asarray(out) > 0.55).mean() > 0.9


def test_importance_sampling_end_to_end():
    """Density spike at t=1.5 inside [0.5, 2.5]: fine samples concentrate."""
    R = 16

    def sigma_fn(t0, t1):
        tm = (t0 + t1) / 2
        return 50.0 * jnp.exp(-((tm - 1.5) ** 2) / (2 * 0.01))

    near = jnp.full((R, 1), 0.5)
    far = jnp.full((R, 1), 2.5)
    t_starts, t_ends = importance_sampling(
        sigma_fn, 32, 16, near, far, rng=jax.random.PRNGKey(0),
        stratified=True)
    assert t_starts.shape == (R, 49)
    assert (np.asarray(t_ends) >= np.asarray(t_starts) - 1e-6).all()
    tm = np.asarray((t_starts + t_ends) / 2)
    frac_near_peak = (np.abs(tm - 1.5) < 0.3).mean()
    assert frac_near_peak > 0.3  # vs ~0.3/2=0.15 for uniform


def test_volsdf_density_properties():
    inv_std = 20.0
    # deep inside (negative sdf): density -> inv_std
    assert volsdf_density(jnp.array(-1.0), inv_std) == pytest.approx(20.0, rel=1e-3)
    # far outside: density -> 0
    assert volsdf_density(jnp.array(1.0), inv_std) == pytest.approx(0.0, abs=1e-3)
    # at surface: inv_std/2
    assert volsdf_density(jnp.array(0.0), inv_std) == pytest.approx(10.0, rel=1e-5)


def test_neus_alpha_range():
    rng = np.random.default_rng(0)
    sdf = jnp.asarray(rng.normal(0, 0.1, (64, 1)).astype(np.float32))
    normal = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    dists = jnp.full((64, 1), 0.01)
    a = neus_alpha(sdf, normal, dirs, dists, 100.0, cos_anneal_ratio=1.0)
    assert a.shape == (64, 1)
    assert (np.asarray(a) >= 0).all() and (np.asarray(a) <= 1).all()


def test_rays_intersect_bbox():
    rays_o = jnp.array([[0.0, 0.0, 3.0], [5.0, 5.0, 5.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    near, far = rays_intersect_bbox(rays_o, rays_d, radius=1.0)
    assert near[0, 0] == pytest.approx(2.0, abs=1e-4)
    assert far[0, 0] == pytest.approx(4.0, abs=1e-4)
    # miss: zero-length interval
    assert far[1, 0] - near[1, 0] <= 1e-5


def test_hashgrid_f4_reslice_grad_parity():
    """The bench's TPU-first 8x4 re-slice (wider features per level, fewer
    levels; identical params/output-width/finest-res as tcnn 16x2): custom
    VJP table grads must match plain-XLA autodiff for F=4 with simplex +
    packing, in both encode and encode_with_grad."""
    from scaledreamer_tpu.ops.hashgrid import (_encode_impl, hashgrid_encode,
                                               hashgrid_encode_with_grad)
    cfg = HashGridConfig(n_levels=3, n_features_per_level=4,
                         log2_hashmap_size=8, base_resolution=4,
                         per_level_scale=2.21, interpolation="Simplex",
                         dense_cell_packing=True, compute_x_grad=False)
    k = jax.random.PRNGKey(0)
    table = jax.random.normal(k, (3, 256, 4)) * 0.1
    x = jax.random.uniform(jax.random.fold_in(k, 1), (64, 3))
    y = hashgrid_encode(table, x, cfg)
    y_ref = _encode_impl(table, x, cfg, None)
    assert np.allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
    g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, x, cfg) ** 2))(table)
    g_ref = jax.grad(lambda t: jnp.sum(_encode_impl(t, x, cfg, None) ** 2))(
        table)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
    # fused encode+spatial-grad path
    enc, denc = hashgrid_encode_with_grad(table, x, cfg)
    assert np.allclose(np.asarray(enc), np.asarray(y_ref), atol=1e-6)
    g2 = jax.grad(lambda t: jnp.sum(
        hashgrid_encode_with_grad(t, x, cfg)[0] ** 2))(table)
    assert np.allclose(np.asarray(g2), np.asarray(g_ref), atol=1e-5)


def test_hashgrid_encoding_max_levels_truncation():
    """HashGridEncoding(max_levels=k): the first k*F output dims match the
    full encode exactly and the rest are zero, in both the plain and the
    fused encode+grad paths (the renderer's prop_encode_levels knob)."""
    from scaledreamer_tpu.ops.networks import HashGridEncoding
    cfg = HashGridConfig(n_levels=4, n_features_per_level=2,
                         log2_hashmap_size=8, base_resolution=4,
                         per_level_scale=1.7)
    enc_mod = HashGridEncoding(grid=cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.fold_in(k, 1), (32, 3))
    params = enc_mod.init(k, x)
    full = np.asarray(enc_mod.apply(params, x))
    kF = 2 * cfg.n_features_per_level
    trunc = np.asarray(enc_mod.apply(params, x, max_levels=2))
    assert trunc.shape == full.shape
    assert np.allclose(trunc[:, :kF], full[:, :kF], atol=1e-6)
    assert np.all(trunc[:, kF:] == 0.0)
    enc_t, denc_t = enc_mod.apply(params, x, max_levels=2, with_grad=True)
    enc_f, denc_f = enc_mod.apply(params, x, with_grad=True)
    assert np.allclose(np.asarray(enc_t)[:, :kF],
                       np.asarray(enc_f)[:, :kF], atol=1e-6)
    assert np.all(np.asarray(enc_t)[:, kF:] == 0.0)
    assert np.allclose(np.asarray(denc_t)[..., :kF],
                       np.asarray(denc_f)[..., :kF], atol=1e-6)
    assert np.all(np.asarray(denc_t)[..., kF:] == 0.0)

def test_prop_interlevel_loss_invariants():
    """Outer-measure loss (nerfacc _pdf_loss parity): zero when the prop
    CDF upper-bounds the final weights, positive when prop misses mass."""
    import jax
    import jax.numpy as jnp
    from scaledreamer_tpu.ops.render import prop_interlevel_loss

    R, P, N = 4, 8, 6
    prop_svals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, P + 1), (R, P + 1))
    final_svals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N + 1), (R, N + 1))

    # prop covers everything (cdf 0 -> 1 linearly = uniform mass): any
    # final weights summing <= the prop mass in their envelope give ~0
    prop_cdfs = prop_svals
    w_uniform = jnp.full((R, N), 1.0 / N) * 0.5  # half the prop mass
    loss = prop_interlevel_loss(final_svals, w_uniform, prop_svals,
                                prop_cdfs)
    assert loss.shape == (R,)
    assert float(jnp.max(loss)) < 1e-6

    # prop has ZERO mass in the second half; final mass concentrated there
    # must be penalized
    half = jnp.concatenate([jnp.linspace(0.0, 1.0, P // 2 + 1),
                            jnp.ones(P // 2)])
    prop_cdfs_bad = jnp.broadcast_to(half, (R, P + 1))
    w_late = jnp.zeros((R, N)).at[:, -1].set(0.9)  # mass near s=1
    loss_bad = prop_interlevel_loss(final_svals, w_late, prop_svals,
                                    prop_cdfs_bad)
    assert float(jnp.min(loss_bad)) > 1e-3

    # gradient flows to prop_cdfs, NOT to final weights
    g = jax.grad(lambda c: prop_interlevel_loss(
        final_svals, w_late, prop_svals, c).sum())(prop_cdfs_bad)
    assert float(jnp.abs(g).sum()) > 0
    gw = jax.grad(lambda w: prop_interlevel_loss(
        final_svals, w, prop_svals, prop_cdfs_bad).sum())(w_late)
    assert float(jnp.abs(gw).sum()) == 0.0
