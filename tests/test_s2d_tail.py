"""Space-to-depth (phase-form) decoder tail: exactness + transforms.

The s2d tail (nn/unet_decoder.py S2DTailBlock + heads.py s2d_input) computes
the final DecoderBlock and head conv in 2x2 phase form — the TPU fast path
for the reference hot loop (src/segmentation_models/decoders/unet/decoder.py:
38-46). These tests pin that it is numerically the standard path (tests run
at jax_default_matmul_precision=highest, the parity mode, so the comparison
is exact to f32 reassociation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.ops.fused_upsample import (
    depth_to_space,
    depth_to_space2,
    s2d_conv_kernel,
    s2d_conv_kernel_f,
    space_to_depth,
    space_to_depth2,
    up_phase_conv_kernel,
    up_phase_h2_conv_kernel,
)
from hallucidet_tpu.ops.image_ops import upsample_nearest
from hallucidet_tpu.translation.unet import Unet


def _conv(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )


def test_s2d_round_trip():
    x = jnp.arange(2 * 8 * 12 * 5, dtype=jnp.float32).reshape(2, 8, 12, 5)
    np.testing.assert_array_equal(depth_to_space2(space_to_depth2(x)), x)


def test_s2d_conv_kernel_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref = _conv(x, k)
    got = depth_to_space2(_conv(space_to_depth2(x), s2d_conv_kernel(k)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_up_phase_conv_kernel_exact():
    rng = np.random.RandomState(1)
    xc = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref = _conv(upsample_nearest(xc, 2), k)
    got = depth_to_space2(_conv(xc, up_phase_conv_kernel(k)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fh,fw", [(4, 2), (2, 4), (4, 4), (3, 2)])
def test_s2d_round_trip_general(fh, fw):
    x = jnp.arange(2 * 24 * 24 * 5, dtype=jnp.float32).reshape(2, 24, 24, 5)
    np.testing.assert_array_equal(
        depth_to_space(space_to_depth(x, fh, fw), fh, fw), x
    )


@pytest.mark.parametrize("fh,fw", [(4, 2), (2, 4), (4, 4)])
def test_s2d_conv_kernel_f_exact(fh, fw):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref = _conv(x, k)
    got = depth_to_space(
        _conv(space_to_depth(x, fh, fw), s2d_conv_kernel_f(k, fh, fw)), fh, fw
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_up_phase_h2_conv_kernel_exact():
    """conv3x3(up2(x)) == D2S(conv'(x, strides=(2,1)), 4, 2) — the strided
    4-tap H2 kernel consumes the coarse input with no fold copy."""
    rng = np.random.RandomState(3)
    xc = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref = _conv(upsample_nearest(xc, 2), k)
    dn = jax.lax.conv_dimension_numbers(
        xc.shape, (4, 3, 5, 56), ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        xc, up_phase_h2_conv_kernel(k), (2, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn,
    )
    np.testing.assert_allclose(
        depth_to_space(y, 4, 2), ref, rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("fh,fw", [(2, 2), (4, 2)])
def test_resize_bilinear_from_phase_exact(fh, fw):
    from hallucidet_tpu.ops.image_ops import (
        resize_bilinear,
        resize_bilinear_from_phase,
    )

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 24, 3).astype(np.float32))
    ref = resize_bilinear(x, (11, 13))
    got = resize_bilinear_from_phase(
        space_to_depth(x, fh, fw), (11, 13), (fh, fw)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def unet_pair():
    m_std = Unet(encoder_name="resnet18", s2d_tail=False)
    m_s2d = Unet(encoder_name="resnet18", s2d_tail=True)
    v = m_std.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    return m_std, m_s2d, v


def test_s2d_tail_param_tree_identical(unet_pair):
    m_std, m_s2d, v = unet_pair
    v2 = m_s2d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape


def test_s2d_tail_eval_exact(unet_pair):
    m_std, m_s2d, v = unet_pair
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 96, 3), jnp.float32)
    y_std = m_std.apply(v, x, False)
    y_s2d = m_s2d.apply(v, x, False)
    np.testing.assert_allclose(y_s2d, y_std, atol=1e-5)


def test_s2d_tail_train_stats_exact(unet_pair):
    m_std, m_s2d, v = unet_pair
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 96, 3), jnp.float32)
    y1, u1 = m_std.apply(v, x, True, mutable=["batch_stats"])
    y2, u2 = m_s2d.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(y2, y1, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_s2d_tail_gradients_match(unet_pair):
    m_std, m_s2d, v = unet_pair
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)

    def loss(m):
        return lambda p: (m.apply({**v, "params": p}, x, False) ** 2).sum()

    g1 = jax.grad(loss(m_std))(v["params"])
    g2 = jax.grad(loss(m_s2d))(v["params"])
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        np.testing.assert_allclose(
            b, a, rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(p1),
        )


def test_gray_fold_stem_exact():
    """ResNet on a 1-channel input == ResNet on the 3x-replicated input with
    the same 3-channel params (conv(rep3(x), W) == conv(x, W.sum(ch)));
    holds with and without the s2d stem."""
    from hallucidet_tpu.nn.resnet import ResNet

    for s2d in (True, False):
        m = ResNet(arch="resnet18", s2d_stem=s2d)
        x1 = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 96, 1))
        x3 = jnp.repeat(x1, 3, axis=-1)
        v = m.init(jax.random.PRNGKey(1), x3, False)
        f3 = m.apply(v, x3, False)
        f1 = m.apply(v, x1, False)
        for a, b in zip(f3[1:], f1[1:]):  # features[0] is the input itself
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5
            )


def test_unetmodified_s2d_exact():
    """UnetModified (no skips): the s2d mid+tail path must equal standard."""
    m_std = Unet(encoder_name="resnet18", use_skips=False, s2d_tail=False)
    m_s2d = Unet(encoder_name="resnet18", use_skips=False, s2d_tail=True)
    v = m_std.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3), jnp.float32)
    np.testing.assert_allclose(
        m_s2d.apply(v, x, False), m_std.apply(v, x, False), atol=1e-5
    )


def test_s2d_tail_disabled_with_attention():
    # attention blocks need full-resolution features; the flag must fall back
    m = Unet(encoder_name="resnet18", s2d_tail=True,
             decoder_attention_type="scse")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    y = m.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert y.shape == (1, 64, 64, 3)


@pytest.mark.parametrize("factors", [(2, 2), (4, 2)])
def test_phase_form_output_through_detector(factors):
    """unet(output_phase_form=True) -> detector(phase_form=factors) must
    equal the standard full-resolution path exactly (the fused-pipeline fast
    path that skips the depth-to-space), for both the legacy (2,2) form and
    the shipped (4,2) H2 form."""
    from hallucidet_tpu.detection import (
        FasterRCNN,
        FasterRCNNConfig,
        pad_targets,
    )

    fh, fw = factors
    m = Unet(encoder_name="resnet18", s2d_tail=True, s2d_factors=factors)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)

    full = m.apply(v, x, False)
    ph = m.apply(v, x, False, output_phase_form=True)
    assert ph.shape == (1, 64 // fh, 64 // fw, fh * fw * 3)
    np.testing.assert_allclose(depth_to_space(ph, fh, fw), full, atol=1e-6)

    cfg = FasterRCNNConfig(
        num_classes=2, backbone="resnet18",
        rpn_pre_nms_top_n_train=32, rpn_pre_nms_top_n_test=32,
        rpn_post_nms_top_n_train=16, rpn_post_nms_top_n_test=16,
        rpn_nms_candidate_cap=64, box_batch_size_per_image=8,
        box_detections_per_img=5,
    )
    det = FasterRCNN(cfg, image_size=(32, 32))
    dv = det.init(jax.random.PRNGKey(2))
    t = pad_targets([np.array([[8, 8, 40, 48]], np.float32)], [[1]], 4)
    rng = jax.random.PRNGKey(3)
    losses_a, dets_a = det.forward(dv, full, t, train_det=False, rng=rng)
    losses_b, dets_b = det.forward(
        dv, ph, t, train_det=False, rng=rng, phase_form=factors
    )
    for k in losses_a:
        np.testing.assert_allclose(
            float(losses_b[k]), float(losses_a[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(dets_b.boxes), np.asarray(dets_a.boxes), atol=1e-3
    )


