"""Device preprocessing parity vs the host path."""

import numpy as np

import jax
import jax.numpy as jnp

from instageo_tpu.data.dataloader import normalize_and_reshape
from instageo_tpu.ops.preprocess import make_fused_predict_fn, preprocess_chips


def test_preprocess_matches_host_normalize():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 10000, size=(2, 12, 8, 8)).astype(np.uint16)  # T=2,C=6
    mean = rng.uniform(100, 5000, 6).astype(np.float32)
    std = rng.uniform(50, 2000, 6).astype(np.float32)

    dev = preprocess_chips(jnp.asarray(raw), jnp.asarray(mean), jnp.asarray(std),
                           temporal_size=2)
    host = np.stack([
        normalize_and_reshape(raw[i].astype(np.float32), mean, std,
                              temporal_size=2)
        for i in range(2)
    ])
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-4)


def test_preprocess_band_select_and_multiplier():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 100, size=(1, 6, 4, 4)).astype(np.int16)
    mean = jnp.zeros(2)
    std = jnp.ones(2)
    out = preprocess_chips(jnp.asarray(raw), mean, std, temporal_size=1,
                           bands=(1, 3), constant_multiplier=2.0)
    assert out.shape == (1, 2, 1, 4, 4)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                               raw[0, 1].astype(np.float32) * 2.0)


def test_fused_predict_fn():
    from instageo_tpu.models.seg import create_prithvi_seg

    model = create_prithvi_seg("prithvi_eo_tiny", num_classes=2,
                               image_size=32, num_bands=6)
    x0 = jnp.zeros((1, 6, 1, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x0)
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 10000, size=(2, 6, 32, 32)).astype(np.uint16)
    mean = [5000.0] * 6
    std = [3000.0] * 6

    predict = make_fused_predict_fn(model, variables, mean, std)
    preds = predict(jnp.asarray(raw))
    assert preds.shape == (2, 32, 32)
    assert preds.dtype == jnp.int8

    # parity vs the two-step host-normalize path
    host = np.stack([
        normalize_and_reshape(raw[i].astype(np.float32), mean, std, 1)
        for i in range(2)])
    logits = model.apply(variables, jnp.asarray(host), train=False)
    ref = np.asarray(jnp.argmax(logits, axis=1).astype(jnp.int8))
    np.testing.assert_array_equal(np.asarray(preds), ref)
