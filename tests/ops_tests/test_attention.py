"""Pallas attention parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instageo_tpu.ops.attention import attention_reference, flash_attention


@pytest.mark.parametrize("b,l,h,d", [
    (2, 197, 4, 64),   # 224px/p16 T=1 + cls
    (1, 589, 12, 64),  # T=3 Prithvi-100 shape
    (1, 128, 2, 80),   # p14 head dim
])
def test_flash_attention_matches_reference(b, l, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_attention_bf16():
    rng = np.random.default_rng(1)
    shape = (1, 197, 4, 64)
    q = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
    assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize("b,l,h,d", [
    (2, 197, 12, 64),  # Prithvi-100 shape (group 6 over heads)
    (1, 589, 16, 64),  # T=3 300M shape (group 4)
    (1, 128, 2, 80),   # p14 head dim
])
def test_flash_attention_blo_matches_reference(b, l, h, d):
    """Merged-output kernel: (B,H,L,D) in -> (B,L,H*D) out equals the
    reference path's transpose+reshape merge exactly."""
    from instageo_tpu.ops.attention import flash_attention_blo

    rng = np.random.default_rng(7)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
               for _ in range(3))
    # reference consumes (B, L, H, D)
    ref = attention_reference(*(t.transpose(0, 2, 1, 3) for t in (q, k, v)))
    ref = np.asarray(ref).reshape(b, l, h * d)
    out = flash_attention_blo(q, k, v, interpret=True)
    assert out.shape == (b, l, h * d)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_flash_attention_blo_backward_matches_reference():
    """Backward of the merged-output layout: dq/dk/dv (heads-first)
    match the XLA einsum path's grads."""
    from instageo_tpu.ops.attention import flash_attention_blo

    rng = np.random.default_rng(8)
    b, l, h, d = 2, 37, 4, 16  # unpadded odd length exercises masking
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32))
               for _ in range(3))
    w = jnp.asarray(rng.standard_normal((h * d,)).astype(np.float32))

    def loss_blo(q, k, v):
        # weighted sum exercises a non-uniform cotangent in merged layout
        return (flash_attention_blo(q, k, v, True) * w).sum()

    def loss_ref(q, k, v):
        out = attention_reference(*(t.transpose(0, 2, 1, 3)
                                    for t in (q, k, v)))
        return (out.reshape(b, l, h * d) * w).sum()

    g_blo = jax.grad(loss_blo, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_blo, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_block_attention_via_model_flag():
    """Attention impl flag reaches the Block module."""
    from instageo_tpu.models.prithvi import Block

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    blk_xla = Block(num_heads=4, attn_impl="xla")
    params = blk_xla.init(jax.random.PRNGKey(0), x)
    out_xla = blk_xla.apply(params, x)
    # pallas path in interpret mode isn't reachable through the flag on CPU
    # (compiled mode requires TPU); verify the flag plumbs through to the
    # same params structure instead.
    blk_p = Block(num_heads=4, attn_impl="pallas")
    params_p = jax.eval_shape(lambda: blk_p.init(jax.random.PRNGKey(0), x))
    assert jax.tree.structure(params_p) == jax.tree.structure(
        jax.eval_shape(lambda: params))
    assert np.isfinite(np.asarray(out_xla)).all()


def test_attn_impl_auto_matches_xla_numerics():
    """attn_impl=auto resolves per traced batch size; on CPU both
    branches lower to the XLA path, so outputs must match exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instageo_tpu.models.prithvi import Attention

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 32)),
                    jnp.float32)
    outs = {}
    for impl in ("xla", "auto"):
        m = Attention(num_heads=4, dtype=jnp.float32, attn_impl=impl)
        v = m.init(jax.random.PRNGKey(0), x)
        outs[impl] = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(outs["xla"], outs["auto"])


def test_flash_attention_backward_matches_reference():
    """custom_vjp backward (round 3): grads match the XLA einsum path."""
    rng = np.random.default_rng(5)
    b, l, h, d = 2, 37, 4, 16  # unpadded odd length exercises masking
    q, k, v = (jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))
               for _ in range(3))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, True).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v).astype(jnp.float32) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_flash_attention_backward_bf16_trains():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((1, 197, 12, 64))).astype(jnp.bfloat16)
    g = jax.grad(lambda q: flash_attention(q, q, q, True).astype(
        jnp.float32).sum())(q)
    assert g.dtype == jnp.bfloat16 and bool(jnp.isfinite(
        g.astype(jnp.float32)).all())
