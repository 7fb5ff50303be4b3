"""Exactness tests for the fused upsample+concat+conv3x3 decoder path."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.nn.unet_decoder import DecoderBlock
from hallucidet_tpu.ops.fused_upsample import upsample2_concat_conv3x3
from hallucidet_tpu.ops.image_ops import upsample_nearest


def naive(x, skip, kernel, bias=None):
    up = upsample_nearest(x, 2)
    cat = jnp.concatenate([up, skip], axis=-1) if skip is not None else up
    dn = jax.lax.conv_dimension_numbers(
        cat.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        cat, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )
    return out + bias if bias is not None else out


def test_fused_matches_naive_with_skip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 8, 5).astype(np.float32))
    skip = jnp.asarray(rng.randn(2, 12, 16, 3).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    want = naive(x, skip, kernel, bias)
    got = upsample2_concat_conv3x3(x, skip, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_matches_naive_no_skip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, 7, 6).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32) * 0.1)
    want = naive(x, None, kernel)
    got = upsample2_concat_conv3x3(x, None, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_decoder_block_fused_equals_unfused():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))

    fused = DecoderBlock(out_channels=12, skip_channels=8, fused=True)
    plain = DecoderBlock(out_channels=12, skip_channels=8, fused=False)
    variables = fused.init(jax.random.PRNGKey(0), x, skip)
    # identical param tree names -> same variables drive both paths
    out_f = fused.apply(variables, x, skip)
    out_p = plain.apply(variables, x, skip)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)


def test_fused_gradients_match():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 4, 6).astype(np.float32))
    skip = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 10, 5).astype(np.float32) * 0.1)

    g_f = jax.grad(lambda k: jnp.sum(upsample2_concat_conv3x3(x, skip, k) ** 2))(
        kernel
    )
    g_n = jax.grad(lambda k: jnp.sum(naive(x, skip, k) ** 2))(kernel)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_n), atol=1e-4)
