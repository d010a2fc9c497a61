"""Model zoo: shapes, dtypes, determinism, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.models import build_model, MODEL_REGISTRY

KEY = jax.random.PRNGKey(0)


def _apply(model, variables, x):
    if "batch_stats" in variables:
        out, _ = model.apply(variables, x, train=False, mutable=["batch_stats"])
        return out
    return model.apply(variables, x, train=False)


@pytest.mark.parametrize(
    "name,x_shape,d_out,kwargs",
    [
        ("Net2D", (3, 20, 20, 2), 387, {"filters": 8}),
        ("LinearMap", (3, 20, 20, 2), 387, {}),
        ("FCNN", (3, 6), 387, {"hidden_dims": (16, 32)}),
        ("UNetWithHead", (3, 20, 20, 2), 387, {"base_ch": 4, "latent_ch": 8, "head_filters": 8}),
    ],
)
def test_steady_models(name, x_shape, d_out, kwargs):
    m = build_model(name, d_out=d_out, **kwargs)
    x = jax.random.normal(KEY, x_shape)
    vs = m.init(KEY, x, train=False)
    out = _apply(m, vs, x)
    assert out.shape == (x_shape[0], d_out)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "name,x_shape,kwargs",
    [
        ("UNet2D", (2, 16, 16, 2), {"base_ch": 4, "latent_ch": 8, "hidden": 16}),
        ("UNetTemporal", (2, 16, 16, 2), {"base_ch": 4, "latent_ch": 8, "hidden": 16}),
        ("UNet1D", (2, 101, 3), {"base_ch": 4, "latent_ch": 8, "hidden": 16}),
        ("RNN", (2, 101), {"hidden": 32}),
        ("LinearStep", (2, 101), {}),
        ("LinearStepRNN", (2, 101), {"hidden": 32}),
    ],
)
def test_temporal_models(name, x_shape, kwargs):
    T = 5
    d_out = 101
    m = build_model(name, d_out=d_out, seq_len=T, **kwargs)
    x = jax.random.normal(KEY, x_shape)
    vs = m.init(KEY, x, train=False)
    out = _apply(m, vs, x)
    assert out.shape == (x_shape[0], T, d_out)
    assert np.isfinite(np.asarray(out)).all()


def test_registry_complete():
    # every reference model family has a counterpart (SURVEY.md C15-C18)
    for ref_name in ["Net2D", "FCNN", "UNetWithHead", "UNet2D", "UNetTemporal", "UNet1D", "RNN"]:
        assert ref_name in MODEL_REGISTRY


def test_linear_step_identity_init():
    """At init (identity kernels, zero biases) every emitted step equals the
    input — the T-step product is exactly conditioned at the start of
    training, and the affine recursion semantics are pinned."""
    T, n = 4, 13
    m = build_model("LinearStep", d_out=n, seq_len=T)
    x = jax.random.normal(KEY, (3, n))
    vs = m.init(KEY, x, train=False)
    out = np.asarray(m.apply(vs, x, train=False))
    np.testing.assert_allclose(out, np.broadcast_to(np.asarray(x)[:, None, :], (3, T, n)))

    # with a set step matrix W and bias b the rollout is h_t = h_{t-1} W + b
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (n, n)), np.float32) * np.float32(0.1)
    b = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (n,)), np.float32)
    import flax

    vs2 = flax.core.unfreeze(vs)
    vs2["params"]["Scan_AffineStep_0"]["Dense_0"]["kernel"] = jnp.asarray(W)
    vs2["params"]["Scan_AffineStep_0"]["Dense_0"]["bias"] = jnp.asarray(b)
    out2 = np.asarray(m.apply(vs2, x, train=False))
    h = np.asarray(x)
    for t in range(T):
        h = h @ W + b
        np.testing.assert_allclose(out2[:, t, :], h, rtol=2e-5, atol=2e-5)


def test_linear_step_rnn_zero_gate():
    """At init the composite IS the identity LinearStep (alpha=0 kills the
    RNN branch), and alpha receives a gradient so the gate can open."""
    T, n = 4, 13
    m = build_model("LinearStepRNN", d_out=n, seq_len=T, hidden=16)
    x = jax.random.normal(KEY, (3, n))
    vs = m.init(KEY, x, train=False)
    out = np.asarray(m.apply(vs, x, train=False))
    np.testing.assert_allclose(
        out, np.broadcast_to(np.asarray(x)[:, None, :], (3, T, n)),
        rtol=1e-6, atol=1e-6,
    )

    tgt = jax.random.normal(jax.random.PRNGKey(7), (3, T, n))
    g = jax.grad(
        lambda p: jnp.sum((m.apply({"params": p}, x, train=False) - tgt) ** 2)
    )(vs["params"])
    assert float(jnp.abs(g["alpha"]).sum()) > 0.0


def test_linear_map_is_affine():
    m = build_model("LinearMap", d_out=17)
    x1 = jax.random.normal(KEY, (2, 5, 5, 2))
    x2 = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 5, 2))
    vs = m.init(KEY, x1, train=False)
    y1 = np.asarray(m.apply(vs, x1, train=False))
    y2 = np.asarray(m.apply(vs, x2, train=False))
    ymid = np.asarray(m.apply(vs, 0.5 * (x1 + x2), train=False))
    np.testing.assert_allclose(ymid, 0.5 * (y1 + y2), rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    m = build_model("UNetWithHead", d_out=50, base_ch=4, latent_ch=4, head_filters=4)
    x = jax.random.normal(KEY, (2, 16, 16, 2))
    vs = m.init(KEY, x, train=False)

    def loss(params):
        out, _ = m.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(vs["params"])
    norms = [float(jnp.linalg.norm(p)) for p in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.8


def test_rnn_autoregressive_depends_on_input():
    m = build_model("RNN", d_out=20, seq_len=3, hidden=16)
    x1 = jnp.ones((1, 20))
    x2 = 2.0 * jnp.ones((1, 20))
    vs = m.init(KEY, x1, train=False)
    o1 = m.apply(vs, x1, train=False)
    o2 = m.apply(vs, x2, train=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_torch_default_init_distribution():
    """C19: params are initialized with torch's defaults — kernel AND bias
    ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (the reference's weights_init is a
    no-op for 2D models, so torch defaults are what its models train from)."""
    import jax
    from feonet_navier_stokes_tpu.models import build_model

    m = build_model("Net2D", d_out=50, filters=32, kernel_size=5)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 20, 2)), train=False)
    k0 = v["params"]["Conv_0"]["kernel"]  # (5, 5, 2, 32)
    b0 = v["params"]["Conv_0"]["bias"]
    fan_in = 5 * 5 * 2
    bound = 1.0 / np.sqrt(fan_in)
    for arr in (np.asarray(k0), np.asarray(b0)):
        assert np.abs(arr).max() <= bound + 1e-7
    # uniform variance = bound^2/3; lecun-normal would be 3x larger for kernel
    var = np.var(np.asarray(k0))
    np.testing.assert_allclose(var, bound**2 / 3.0, rtol=0.15)
    assert np.abs(np.asarray(b0)).max() > 0.0  # flax default bias is zeros


def test_net2d_bfloat16_compute_path():
    """compute_dtype=bfloat16 runs the conv stack on the MXU dtype while the
    coefficient head stays float32; outputs track the f32 path within bf16
    tolerance (benchmarked as bf16_steps_per_sec in bench.py)."""
    import jax
    from feonet_navier_stokes_tpu.models import build_model

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 20, 2))
    m32 = build_model("Net2D", d_out=50, filters=8)
    m16 = build_model("Net2D", d_out=50, filters=8, compute_dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(1), x, train=False)
    y32 = np.asarray(m32.apply(v, x, train=False))
    y16 = np.asarray(m16.apply(v, x, train=False))
    assert y16.dtype == np.float32  # head output stays f32
    denom = max(np.abs(y32).max(), 1e-6)
    assert np.abs(y16 - y32).max() / denom < 0.05


def test_net2d_pool_shrinks_head():
    """pool=k applies k 2x2 max-pools before the flatten, shrinking the head
    Dense kernel ~4^k (required to fit a d_out ~ 45k head in HBM — the 38k
    hole problem's Net2D head OOMed at init without it)."""
    m = build_model("Net2D", d_out=7, filters=8, pool=2)
    v = m.init(KEY, jnp.zeros((1, 20, 20, 2)))
    assert v["params"]["Dense_0"]["kernel"].shape == (5 * 5 * 8, 7)
    out = _apply(m, v, jnp.zeros((3, 20, 20, 2)))
    assert out.shape == (3, 7)


def test_factored_head_rank():
    """head_rank=r factors the Dense head into flatten x r @ r x d_out (the
    47k-DoF optimizer-traffic lever, bench bsr_50k_rank512); rank 0 keeps the
    parity-default monolithic head."""
    m = build_model("Net2D", d_out=64, filters=8, head_rank=4)
    v = m.init(KEY, jnp.zeros((1, 10, 10, 2)))
    assert v["params"]["Dense_0"]["kernel"].shape == (10 * 10 * 8, 4)
    assert v["params"]["Dense_1"]["kernel"].shape == (4, 64)
    out = _apply(m, v, jnp.zeros((3, 10, 10, 2)))
    assert out.shape == (3, 64)

    u = build_model("UNetWithHead", d_out=32, base_ch=4, latent_ch=4,
                    head_filters=4, head_rank=8)
    vu = u.init(KEY, jnp.zeros((1, 16, 16, 2)))
    heads = vu["params"]["UNetHead_0"]
    assert heads["Dense_0"]["kernel"].shape[1] == 8
    assert heads["Dense_1"]["kernel"].shape == (8, 32)


def test_head_dtype_bf16():
    """head_dtype=bf16 runs the head matmuls in bfloat16 but keeps params
    (and the model OUTPUT) float32 — master weights stay exact for the
    optimizer; only operand traffic/MXU rate change."""
    m = build_model("Net2D", d_out=16, filters=4,
                    head_dtype=jnp.bfloat16)
    v = m.init(KEY, jnp.zeros((1, 10, 10, 2)))
    assert v["params"]["Dense_0"]["kernel"].dtype == jnp.float32
    out = _apply(m, v, jnp.ones((2, 10, 10, 2)))
    assert out.dtype == jnp.float32 and out.shape == (2, 16)

    u = build_model("UNetWithHead", d_out=8, base_ch=4, latent_ch=4,
                    head_filters=4, head_dtype=jnp.bfloat16)
    vu = u.init(KEY, jnp.zeros((1, 16, 16, 2)))
    assert (vu["params"]["UNetHead_0"]["Dense_0"]["kernel"].dtype
            == jnp.float32)
    out = _apply(u, vu, jnp.ones((2, 16, 16, 2)))
    assert out.dtype == jnp.float32 and out.shape == (2, 8)
