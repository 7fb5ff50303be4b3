"""Shape/semantics tests for the NN layer (encoders, FPN, U-Net)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.nn import FPN, ResNet
from hallucidet_tpu.nn.layers import FrozenBatchNorm
from hallucidet_tpu.translation import Unet, create_model


def test_resnet18_feature_shapes():
    m = ResNet(arch="resnet18")
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(vars_, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 64, 96, 3),
        (1, 32, 48, 64),
        (1, 16, 24, 64),
        (1, 8, 12, 128),
        (1, 4, 6, 256),
        (1, 2, 3, 512),
    ]


def test_resnet50_feature_channels_and_frozen_bn():
    m = ResNet(arch="resnet50", frozen_bn=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    # frozen backbone has no batch_stats collection at all
    assert set(vars_.keys()) == {"params"}
    feats = m.apply(vars_, x)
    assert [f.shape[-1] for f in feats] == [3, 64, 256, 512, 1024, 2048]


def test_frozen_bn_no_gradient():
    m = FrozenBatchNorm(4)
    x = jnp.ones((1, 2, 2, 4))
    vars_ = m.init(jax.random.PRNGKey(0), x)

    def loss(v):
        return jnp.sum(m.apply(v, x) ** 2)

    g = jax.grad(loss)(vars_)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.allclose(np.asarray(leaf), 0.0) for leaf in flat)


def test_fpn_shapes_pool_and_p6p7():
    rng = jax.random.PRNGKey(0)
    feats = [
        jnp.zeros((1, 75, 75, 256)),
        jnp.zeros((1, 38, 38, 512)),
        jnp.zeros((1, 19, 19, 1024)),
        jnp.zeros((1, 10, 10, 2048)),
    ]
    fpn = FPN(out_channels=256, extra="pool")
    v = fpn.init(rng, feats)
    outs = fpn.apply(v, feats)
    assert [o.shape[1:3] for o in outs] == [
        (75, 75),
        (38, 38),
        (19, 19),
        (10, 10),
        (5, 5),
    ]
    assert all(o.shape[-1] == 256 for o in outs)

    fpn2 = FPN(out_channels=256, extra="p6p7")
    feats3 = feats[1:]
    v2 = fpn2.init(rng, feats3)
    outs2 = fpn2.apply(v2, feats3)
    assert [o.shape[1:3] for o in outs2] == [
        (38, 38),
        (19, 19),
        (10, 10),
        (5, 5),
        (3, 3),
    ]


def test_nearest_resize_matches_take_oracle():
    """Loop-free nearest resize (repeat-2-crop / one-hot einsum, PERF.md r4)
    must be bit-exact vs the jnp.take reference on the FPN's actual upsample
    sizes (2*in and 2*in-1) AND on a non-repeat-2 ratio (one-hot path)."""
    from hallucidet_tpu.nn.fpn import _nearest_idx, nearest_resize

    rng = jax.random.PRNGKey(7)
    for (h, w), (oh, ow) in [
        ((38, 38), (75, 75)),  # 2*in-1: repeat-2-crop path
        ((19, 19), (38, 38)),  # exact 2x
        ((10, 10), (19, 19)),
        ((10, 12), (25, 30)),  # ratio > 2: one-hot einsum path
        ((9, 7), (13, 20)),  # non-integer ratios
    ]:
        x = jax.random.normal(rng, (2, h, w, 5), jnp.float32)
        got = nearest_resize(x, (oh, ow))
        want = jnp.take(x, jnp.asarray(_nearest_idx(h, oh)), axis=1)
        want = jnp.take(want, jnp.asarray(_nearest_idx(w, ow)), axis=2)
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unet_output_range_and_shape():
    m = create_model("unet", encoder_name="resnet18", classes=3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    y = m.apply(vars_, x, False)
    assert y.shape == (1, 64, 96, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid head


def test_unet_rejects_bad_shape():
    m = Unet(encoder_name="resnet18")
    x = jnp.zeros((1, 60, 64, 3))
    with pytest.raises(ValueError, match="divisible"):
        m.init(jax.random.PRNGKey(0), x, False)


def test_unetmodified_no_skips_still_runs():
    m = create_model("unetmodified", encoder_name="resnet18", classes=3)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    y = m.apply(vars_, x, False)
    assert y.shape == (1, 64, 64, 3)


def test_unet_train_mode_updates_batch_stats():
    m = create_model("unet", encoder_name="resnet18", classes=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, False)
    y, updates = m.apply(vars_, x, True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed
