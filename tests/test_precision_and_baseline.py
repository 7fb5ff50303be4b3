"""Tests: bf16 precision mode of the HalluciDet module; IR-DA baseline model."""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig
from hallucidet_tpu.translation import CnnBasedThermalInfraredDA

SMALL_DET = FasterRCNNConfig(
    num_classes=2, backbone="resnet18",
    rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
    rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
    rpn_nms_candidate_cap=128, box_batch_size_per_image=16,
    box_detections_per_img=5,
)


def _small_module(precision):
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet18", input_size=64,
        precision=precision,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    m.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    m.det_variables = m.detector.impl.init(jax.random.PRNGKey(1))
    return m


def _batch(b=1):
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    ir = jnp.asarray(rng.rand(b, 64, 64, 1).astype(np.float32))
    t = pad_targets(
        [np.array([[8, 8, 40, 48]], np.float32)] * b, [np.array([1])] * b, 4
    )
    return rgb, t, ir, t


def test_precision16_trains_and_stays_finite():
    m = _small_module(16)
    step = jax.jit(m.make_train_step(), donate_argnums=0)
    state = (
        m.ed_variables["params"],
        m.ed_variables.get("batch_stats", {}),
        m.opt_state,
    )
    state, logs = step(state, _batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["total"]))
    # params stay f32 master copies
    leaf = jax.tree_util.tree_leaves(state[0])[0]
    assert leaf.dtype == jnp.float32
    # batch stats stay f32
    bs_leaf = jax.tree_util.tree_leaves(state[1])[0]
    assert bs_leaf.dtype == jnp.float32


def test_precision16_close_to_fp32():
    m16 = _small_module(16)
    m32 = _small_module(32)
    m32.ed_variables = m16.ed_variables
    m32.det_variables = m16.det_variables
    batch = _batch()
    e16 = m16.make_eval_step(with_baselines=False)
    e32 = m32.make_eval_step(with_baselines=False)
    state = (
        m16.ed_variables["params"], m16.ed_variables.get("batch_stats", {})
    )
    t16, _, _, _ = e16(state, batch, jax.random.PRNGKey(0))
    t32, _, _, _ = e32(state, batch, jax.random.PRNGKey(0))
    assert abs(float(t16) - float(t32)) / max(abs(float(t32)), 1e-6) < 0.25


def test_train_det_unfreezes_detector():
    """cfg.train_det=True must flow gradients into the detector params and
    update them (reference: train_hallucidet.py:102-105, :429-435)."""
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet18", input_size=64,
        train_det=True,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    m.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    m.det_variables = m.detector.impl.init(jax.random.PRNGKey(1))
    params = {"ed": m.ed_variables["params"], "det": m.det_variables["params"]}
    opt_state = m.tx.init(params)
    step = jax.jit(m.make_train_step())
    state = (params, m.ed_variables.get("batch_stats", {}), opt_state)
    state, logs = step(state, _batch(), jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["total"]))
    before = jax.tree_util.tree_leaves_with_path(params["det"])
    after = jax.tree_util.tree_leaves_with_path(state[0]["det"])
    for (path, b), (_, a) in zip(before, after):
        name = jax.tree_util.keystr(path)
        is_frozen_bn = any(
            k in name for k in ("running_mean", "running_var")
        ) or ("bn" in name and "['body']" in name) or (
            "downsample_1" in name and "['body']" in name
        )
        moved = float(jnp.abs(a - b).max()) > 0
        if is_frozen_bn:
            # FrozenBatchNorm constants never train, exactly like
            # torchvision's FrozenBatchNorm2d buffers
            assert not moved, f"frozen-BN leaf moved: {name}"
        else:
            assert moved, f"trainable detector leaf did not move: {name}"


def test_cnn_based_da_baseline():
    model = CnnBasedThermalInfraredDA(
        model_name="fasterrcnn", preprocessing="invert_equalization",
        input_size=64,
    )
    model.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    variables = model.detector.impl.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    targets = pad_targets([np.array([[8, 8, 40, 40]], np.float32)], [[1]], 4)
    losses, dets = model.forward(variables, imgs, targets, jax.random.PRNGKey(2))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert dets.boxes.shape[1] == SMALL_DET.box_detections_per_img


def test_auto_remat_policy():
    """remat engages only when the no-remat activation estimate overflows
    HBM: the bf16 batch-8 LLVIP reference recipe fits (measured, PERF.md),
    f32 or batch-16 does not; half-res frames fit even in f32."""
    from hallucidet_tpu.train import auto_remat

    assert auto_remat(16, 8, (1024, 1280)) is False
    assert auto_remat(32, 8, (1024, 1280)) is True
    assert auto_remat(16, 16, (1024, 1280)) is True
    assert auto_remat(32, 8, (512, 640)) is False


def test_precast_eval_state_exact():
    """Eval on the pre-cast (bf16) state must equal eval on the raw f32
    state bit-for-bit: forward_step casts to bf16 internally either way,
    and cast(cast(x)) == cast(x). The Trainer's val/test loops and bench.py
    rely on this (one cast per epoch instead of per step)."""
    m = _small_module(16)
    step = jax.jit(m.make_eval_step(with_baselines=False))
    state = (m.ed_variables["params"], m.ed_variables.get("batch_stats", {}))
    pre = m.precast_eval_state(state)
    assert jax.tree_util.tree_leaves(pre[0])[0].dtype == jnp.bfloat16
    batch = _batch()
    t_raw, logs_raw, (d_raw, _, _), _ = step(state, batch, jax.random.PRNGKey(5))
    t_pre, logs_pre, (d_pre, _, _), _ = step(pre, batch, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(t_raw), np.asarray(t_pre))
    np.testing.assert_array_equal(np.asarray(d_raw.boxes), np.asarray(d_pre.boxes))
    np.testing.assert_array_equal(np.asarray(d_raw.scores), np.asarray(d_pre.scores))
    # precision 32: identity
    m32 = _small_module(32)
    s32 = (m32.ed_variables["params"], {})
    assert m32.precast_eval_state(s32) is s32
