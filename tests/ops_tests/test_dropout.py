"""Fused TPU dropout kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instageo_tpu.ops.dropout import (
    LANES,
    _fused_dropout_fwd_impl,
    fused_dropout,
    supports_fused_dropout,
)


def test_rate_scale_and_determinism():
    x = jnp.ones((8 * LANES,), jnp.float32).reshape(64, 64)
    seed = jnp.int32(7)
    out, mask = _fused_dropout_fwd_impl(x, seed, 0.1)
    out = np.asarray(out).ravel()
    mask = np.asarray(mask).ravel()
    # Kept elements are scaled by 1/0.9; dropped are exactly 0.
    np.testing.assert_allclose(out[mask], 1.0 / 0.9, rtol=1e-6)
    assert (out[~mask] == 0).all()
    # Empirical drop rate near 0.1 (4096 samples).
    assert 0.05 < (~mask).mean() < 0.16
    # Deterministic per seed; different per seed.
    out2, _ = _fused_dropout_fwd_impl(x, seed, 0.1)
    np.testing.assert_array_equal(out, np.asarray(out2).ravel())
    out3, _ = _fused_dropout_fwd_impl(x, jnp.int32(8), 0.1)
    assert not np.array_equal(out, np.asarray(out3).ravel())


def test_gradient_uses_saved_mask():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, LANES)).astype(np.float32))
    seed = jnp.int32(3)

    def loss(x):
        return (fused_dropout(x, seed, 0.1) ** 2).sum()

    g = jax.grad(loss)(x)
    out, mask = _fused_dropout_fwd_impl(x, seed, 0.1)
    expected = np.where(np.asarray(mask), 2 * np.asarray(out) / 0.9, 0.0)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5, atol=1e-6)


def test_multi_block_rows_disjoint_streams():
    """Blocks must produce different masks (per-block seeding engaged)."""
    from instageo_tpu.ops import dropout as d

    rows = d.ROWS_PER_BLOCK
    x = jnp.ones((2 * rows, LANES), jnp.bfloat16)
    _, mask = _fused_dropout_fwd_impl(x, jnp.int32(1), 0.1)
    m = np.asarray(mask)
    assert not np.array_equal(m[:rows], m[rows:])


def test_supports_predicate_shapes():
    # CPU backend: kernel path off in production regardless of size.
    assert not supports_fused_dropout(jnp.zeros((64, LANES)))
    assert jax.default_backend() == "cpu"


def test_model_fallback_trains_on_cpu():
    """The TPUDropout module falls back to nn.Dropout off-TPU and the seg
    model still trains (covers the module wiring)."""
    from instageo_tpu.models.seg import create_prithvi_seg

    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=2,
                               image_size=32, num_bands=6)
    x = jnp.zeros((2, 6, 1, 32, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    assert out.shape == (2, 2, 32, 32)
    assert np.isfinite(np.asarray(out)).all()

@pytest.mark.parametrize("impl,levels", [("bits8", 256), ("bits16", 65536)])
def test_bits_dropout_rate_scale_determinism(impl, levels):
    """Raw-bits dropout: unbiased scale, quantized rate, per-key streams."""
    from instageo_tpu.models.seg import TPUDropout

    rate = 0.1
    q = min(round((1 - rate) * levels), levels - 1)
    keep_q = q / levels
    mod = TPUDropout(rate, impl=impl)
    x = jnp.ones((4, 64, 64), jnp.float32)
    out = np.asarray(mod.apply({}, x, False,
                               rngs={"dropout": jax.random.PRNGKey(0)}))
    kept = out != 0
    # Kept elements carry the QUANTIZED-keep-prob scale (exact expectation).
    np.testing.assert_allclose(out[kept], 1.0 / keep_q, rtol=1e-6)
    # Empirical drop rate near the quantized rate (16384 samples).
    assert abs((~kept).mean() - (1 - keep_q)) < 0.02
    # Deterministic per key; different across keys.
    out2 = np.asarray(mod.apply({}, x, False,
                                rngs={"dropout": jax.random.PRNGKey(0)}))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(mod.apply({}, x, False,
                                rngs={"dropout": jax.random.PRNGKey(1)}))
    assert not np.array_equal(out, out3)


def test_bits_dropout_odd_size_falls_back():
    """Sizes not divisible by the lane packing use the bernoulli path."""
    from instageo_tpu.models.seg import TPUDropout

    x = jnp.ones((3, 5), jnp.float32)  # 15 elements: not /2 nor /4
    out = np.asarray(TPUDropout(0.5, impl="bits8").apply(
        {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)}))
    kept = out != 0
    np.testing.assert_allclose(out[kept], 2.0, rtol=1e-6)


def test_bits_dropout_tiny_rate_never_drops_everything():
    """rate < 1/levels must clamp the threshold, not wrap it to zero."""
    from instageo_tpu.models.seg import TPUDropout

    x = jnp.ones((64, 64), jnp.float32)
    out = np.asarray(TPUDropout(1.0 / 512, impl="bits8").apply(
        {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)}))
    assert (out != 0).mean() > 0.9
