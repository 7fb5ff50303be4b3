"""Exactness of the H-folded decoder mid-blocks (ops/fused_upsample
up2_h1fold_conv_kernel / s2d_skipfold_conv_kernel /
up_phase_h2_from_h4fold_kernel; nn/unet_decoder HFoldMidBlock routing).

The lane-starved skip blocks (out_ch < 128) run with H folded into channels
— produced and consumed natively by conv kernels, no fold/unfold copies.
All forms must equal the plain DecoderBlock path up to float reassociation.
"""

import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.nn.unet_decoder import (
    DecoderBlock,
    HFoldMidBlock,
    S2DTailBlock,
    UnetDecoder,
)
from hallucidet_tpu.ops.fused_upsample import fold_h, unfold_h


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))


@pytest.mark.parametrize("fold,cu,cs,o", [(2, 128, 64, 64), (4, 64, 64, 32)])
def test_hfold_mid_block_matches_decoder_block(fold, cu, cs, o):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 10, cu), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 20, cs), jnp.float32)
    ref = DecoderBlock(out_channels=o, skip_channels=cs, fused=True)
    var = ref.init(key, x, skip, False)
    want = ref.apply(var, x, skip, False)
    got = HFoldMidBlock(out_channels=o, fold=fold).apply(var, x, skip, False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(
        HFoldMidBlock(out_channels=o, fold=fold).init(key, x, skip, False)
    )
    assert _rel(want, got) < 1e-5


def test_hfold_mid_block_folded_output():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 10, 64), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 20, 64), jnp.float32)
    ref = DecoderBlock(out_channels=32, skip_channels=64, fused=True)
    var = ref.init(key, x, skip, False)
    want = ref.apply(var, x, skip, False)
    got = HFoldMidBlock(out_channels=32, fold=4, unfold_out=False).apply(
        var, x, skip, False
    )
    assert got.shape == (2, 8, 20, 128)
    assert _rel(want, unfold_h(got, 4)) < 1e-5


def test_tail_consumes_h4_fold():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 10, 32), jnp.float32)
    a = S2DTailBlock(out_channels=16, factors=(4, 2), input_fold=1)
    var = a.init(key, x, False)
    want = a.apply(var, x, False)
    got = S2DTailBlock(out_channels=16, factors=(4, 2), input_fold=4).apply(
        var, fold_h(x, 4), False
    )
    assert _rel(want, got) < 1e-5


def _feats():
    shapes = [
        (2, 128, 64, 3), (2, 64, 32, 64), (2, 32, 16, 64),
        (2, 16, 8, 128), (2, 8, 4, 256), (2, 4, 2, 512),
    ]
    return [
        jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32)
        for i, s in enumerate(shapes)
    ]


def test_unet_decoder_h_fold_exact_fwd_and_grads():
    feats = _feats()
    key = jax.random.PRNGKey(0)
    dec_a = UnetDecoder(h_fold=False)
    dec_b = UnetDecoder(h_fold=True)
    var = dec_a.init(key, feats, False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(
        dec_b.init(key, feats, False)
    )
    out_a = dec_a.apply(var, feats, False)
    out_b = dec_b.apply(var, feats, False)
    assert _rel(out_a, out_b) < 1e-5

    def loss(dec):
        def f(p, bs):
            out, _ = dec.apply(
                {"params": p, "batch_stats": bs}, feats, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)
        return f

    ga = jax.grad(loss(dec_a))(var["params"], var["batch_stats"])
    gb = jax.grad(loss(dec_b))(var["params"], var["batch_stats"])
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)),
        ga, gb,
    )
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-4


def test_unet_decoder_h_fold_with_s2d_tail_handoff():
    """The full fast path: block_3 emits a (4,1) fold consumed natively by
    the (4,2) S2DTailBlock — output must match the no-fold s2d_tail path."""
    feats = _feats()
    key = jax.random.PRNGKey(0)
    dec_a = UnetDecoder(h_fold=False, s2d_tail=True, s2d_factors=(4, 2))
    dec_b = UnetDecoder(h_fold=True, s2d_tail=True, s2d_factors=(4, 2))
    var = dec_a.init(key, feats, False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(
        dec_b.init(key, feats, False)
    )
    out_a = dec_a.apply(var, feats, False)
    out_b = dec_b.apply(var, feats, False)
    assert out_a.shape == out_b.shape  # both (4,2) phase form
    assert _rel(out_a, out_b) < 1e-5


def test_mid_fold_skips_indivisible_shapes():
    """Odd geometries fall back to the plain DecoderBlock path (no crash)."""
    shapes = [
        (1, 36, 20, 3), (1, 18, 10, 64), (1, 9, 5, 64),
    ]
    feats = [
        jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32)
        for i, s in enumerate(shapes)
    ]
    dec = UnetDecoder(decoder_channels=(64, 32), h_fold=True)
    var = dec.init(jax.random.PRNGKey(0), feats, False)
    out = dec.apply(var, feats, False)
    assert out.shape[1:3] == (36, 20)


def test_max_pool_fold2_exact():
    """max_pool3x3s2_fold2 == fold_h(max_pool 3x3/s2/p1, 2) bit-for-bit."""
    from flax import linen as fnn

    from hallucidet_tpu.ops.fused_upsample import max_pool3x3s2_fold2

    for shape in [(2, 16, 10, 5), (1, 64, 33, 3), (3, 8, 8, 64)]:
        x = jax.random.normal(jax.random.PRNGKey(9), shape, jnp.float32)
        want = fold_h(
            fnn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))),
            2,
        )
        got = max_pool3x3s2_fold2(x)
        assert got.shape == want.shape
        assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_max_pool_fold2_grad_exact():
    """The custom_vjp backward (single standard maxpool bwd on the unfolded
    cotangent) must equal the direct grad of fold_h(max_pool) bit-for-bit —
    both resolve window ties to the same first-max element."""
    from flax import linen as fnn

    from hallucidet_tpu.ops.fused_upsample import max_pool3x3s2_fold2

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 16, 10, 5), jnp.float32)
    # include exact ties (ReLU-like zeros) to pin the tie-break behavior
    x = jnp.where(jnp.abs(x) < 0.3, 0.0, x)
    w = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 5, 10), jnp.float32)

    def loss_fold(y):
        return jnp.sum(max_pool3x3s2_fold2(y) * w)

    def loss_ref(y):
        p = fnn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return jnp.sum(fold_h(p, 2) * w)

    ga = jax.grad(loss_fold)(x)
    gb = jax.grad(loss_ref)(x)
    import numpy as np

    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_fold_consume_basic_block_matches_plain():
    """FoldConsumeBasicBlock(fold_h(x)) == BasicBlock(stride 2, downsample)(x)
    with the identical param tree."""
    from hallucidet_tpu.nn.resnet import BasicBlock, FoldConsumeBasicBlock

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 24, 18, 64), jnp.float32)
    ref = BasicBlock(planes=128, stride=2, downsample=True)
    var = ref.init(jax.random.PRNGKey(0), x, False)
    want = ref.apply(var, x, False)
    mod = FoldConsumeBasicBlock(planes=128)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(
        mod.init(jax.random.PRNGKey(0), fold_h(x, 2), False)
    )
    got = mod.apply(var, fold_h(x, 2), False)
    assert got.shape == want.shape
    assert _rel(want, got) < 1e-5


def test_encoder_layer1_h_fold_exact_fwd_stats_grads():
    """ResNet(h_fold_layer1=True) — the copy-free chain: folded maxpool ->
    HFoldBasicBlocks -> FoldConsumeBasicBlock — must match the plain encoder
    in tree structure and to float-reassociation tolerance in outputs (the
    layer1 feature comes back (2,1)-folded), train-mode batch stats, and
    grads (VERDICT r4: lane-bound layer1, PERF.md round 4)."""
    from hallucidet_tpu.nn.resnet import ResNet

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 96, 3), jnp.float32)
    enc_a = ResNet(arch="resnet34", h_fold_layer1=False)
    enc_b = ResNet(arch="resnet34", h_fold_layer1=True)
    var = enc_a.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(
        enc_b.init(jax.random.PRNGKey(0), x, False)
    )
    fa = enc_a.apply(var, x, False)
    fb = enc_b.apply(var, x, False)
    assert fb[1].shape == (2, 8, 48, 256)  # (4,1)-folded stem (round 5)
    assert fb[2].shape == (2, 8, 24, 128)  # (2,1)-folded layer1
    fb = list(fb)
    fb[1] = unfold_h(fb[1], 4)
    fb[2] = unfold_h(fb[2], 2)
    for a, b in zip(fa, fb):
        assert a.shape == b.shape
        assert _rel(a, b) < 1e-5

    def loss(enc):
        def f(p, bs):
            feats, upd = enc.apply(
                {"params": p, "batch_stats": bs}, x, True,
                mutable=["batch_stats"],
            )
            # loss on the layer1 output: layer1 grads compare directly,
            # without downstream relu-gate flips amplifying the fold's
            # ~1e-6 reassociation noise through layers 2-4
            return jnp.sum(feats[2] ** 2), upd
        return f

    (la, ua), ga = jax.value_and_grad(loss(enc_a), has_aux=True)(
        var["params"], var["batch_stats"]
    )
    (lb, ub), gb = jax.value_and_grad(loss(enc_b), has_aux=True)(
        var["params"], var["batch_stats"]
    )
    assert _rel(la, lb) < 1e-5
    for pa, pb in zip(
        jax.tree_util.tree_leaves(ua), jax.tree_util.tree_leaves(ub)
    ):
        assert _rel(pa, pb) < 1e-4  # exact stats: fold positions partition H
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)),
        ga, gb,
    )
    for key in ("conv1", "layer1_0", "layer1_1", "layer1_2"):
        assert max(jax.tree_util.tree_leaves(rel[key])) < 1e-4, (key, rel[key])


def test_encoder_layer1_h_fold_skips_odd_height():
    from hallucidet_tpu.nn.resnet import ResNet

    # layer1 height 75 (stem 150 -> maxpool 75): fold must be skipped
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 300, 64, 3), jnp.float32)
    enc = ResNet(arch="resnet18", h_fold_layer1=True)
    var = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(var, x, False)
    assert feats[2].shape == (1, 75, 16, 64)


def test_unet_layer1_fold_end_to_end():
    """Unet(fold_layer1=True) — encoder chain + fold-aware decoder skip —
    must keep the param tree and match the unfolded model's output and
    grads to float-reassociation tolerance."""
    from hallucidet_tpu.translation.unet import Unet

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 96, 3), jnp.float32)
    a = Unet(encoder_name="resnet18", fold_layer1=False)
    b = Unet(encoder_name="resnet18", fold_layer1=True)
    var = a.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(var) == jax.tree_util.tree_structure(
        b.init(jax.random.PRNGKey(0), x, False)
    )
    ya = a.apply(var, x, False)
    yb = b.apply(var, x, False)
    assert ya.shape == yb.shape
    assert _rel(ya, yb) < 1e-4

    def loss(m):
        def f(p):
            y, upd = m.apply(
                {"params": p, "batch_stats": var["batch_stats"]}, x, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y**2)
        return f

    ga = jax.grad(loss(a))(var["params"])
    gb = jax.grad(loss(b))(var["params"])
    rel = jax.tree_util.tree_map(
        lambda p, q: float(jnp.max(jnp.abs(p - q)) / (jnp.max(jnp.abs(p)) + 1e-9)),
        ga, gb,
    )
    worst = max(jax.tree_util.tree_leaves(rel))
    assert worst < 5e-2, worst  # ReLU-gate flips amplify reassoc noise
    total_rel = abs(
        sum(float(jnp.sum(p)) for p in jax.tree_util.tree_leaves(ga))
        - sum(float(jnp.sum(p)) for p in jax.tree_util.tree_leaves(gb))
    )
    assert total_rel < 1e-2 * max(
        1.0,
        abs(sum(float(jnp.sum(p)) for p in jax.tree_util.tree_leaves(ga))),
    )
