"""Pallas thin-channel conv (ops/thin_conv.py): exactness in interpret mode,
shape gating, and VJP-vs-reference. The kernel is a standalone op (the U-Net
decoder's production fast path is the s2d tail — see PERF.md); these tests
keep it correct for serving shapes where a single fat conv is wanted."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.ops.thin_conv import (
    _reference_conv,
    supports,
    thin_conv3x3,
)


@pytest.mark.parametrize(
    "h,w,c,o",
    [(32, 64, 48, 16), (32, 64, 32, 16), (16, 32, 128, 32),
     (16, 32, 192, 64), (32, 64, 16, 16)],
)
def test_thin_conv_exact_interpret(h, w, c, o):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(o).astype(np.float32))
    assert supports(x.shape, k.shape, 16)
    got = thin_conv3x3(x, k, b, 16, True)  # interpret=True on CPU
    ref = _reference_conv(x, k, b)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_thin_conv_fallback_shapes():
    rng = np.random.RandomState(1)
    # O=24 does not divide 128 -> falls back to the XLA conv
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 24).astype(np.float32))
    assert not supports(x.shape, k.shape)
    np.testing.assert_allclose(
        thin_conv3x3(x, k, None, 16, True), _reference_conv(x, k, None),
        rtol=1e-5,
    )


def test_thin_conv_vjp_matches_reference():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 64, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32))

    def f_pal(x, k, b):
        return (thin_conv3x3(x, k, b, 16, True) ** 2).sum()

    def f_ref(x, k, b):
        return (_reference_conv(x, k, b) ** 2).sum()

    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(x, k, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, k, b)
    for a, r in zip(g_pal, g_ref):
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-3)
