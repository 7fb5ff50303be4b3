"""Real-model multi-device tests (VERDICT #7): the actual HalluciDetModule
train step on the virtual CPU-8 mesh inside the suite — DP numerical
equality with single-device execution, and a real-module (not ToyModule)
SeedSweep. The dryrun is no longer the only multi-device evidence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.train import HalluciDetModule, HalluciDetTrainConfig
from hallucidet_tpu.train.parallel import (
    dp_jit,
    make_mesh,
    replicate,
    shard_batch,
)
from hallucidet_tpu.train.sweep import SeedSweep, unstack_state

SMALL_DET = FasterRCNNConfig(
    num_classes=2, backbone="resnet18",
    rpn_pre_nms_top_n_train=32, rpn_pre_nms_top_n_test=32,
    rpn_post_nms_top_n_train=16, rpn_post_nms_top_n_test=16,
    rpn_nms_candidate_cap=64, box_batch_size_per_image=8,
    box_detections_per_img=5,
)


def _module(seed=0):
    cfg = HalluciDetTrainConfig(
        detector="fasterrcnn", decoder_backbone="resnet18", input_size=64,
    )
    m = HalluciDetModule(cfg, jax.random.PRNGKey(seed), sample_hw=(64, 64))
    m.detector.impl = FasterRCNN(SMALL_DET, image_size=(64, 64))
    m.det_variables = m.detector.impl.init(jax.random.PRNGKey(seed + 1))
    return m


def _batch(b):
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    ir = jnp.asarray(rng.rand(b, 64, 64, 1).astype(np.float32))
    t = pad_targets(
        [np.array([[8, 8, 40, 48]], np.float32)] * b, [np.array([1])] * b, 4
    )
    return rgb, t, ir, t


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the CPU-8 mesh")
def test_hallucidet_dp_step_matches_single_device():
    m = _module()
    step = m.make_train_step()
    batch = _batch(8)
    state0 = (
        m.ed_variables["params"],
        m.ed_variables.get("batch_stats", {}),
        m.opt_state,
    )

    # single-device reference
    s1, logs1 = jax.jit(step)(state0, batch, jax.random.PRNGKey(7))

    # 8-device DP: params replicated, batch sharded, XLA inserts the psum
    mesh = make_mesh(8)
    dstep = dp_jit(step, mesh, donate_state=False)
    s8, logs8 = dstep(
        replicate(mesh, state0), shard_batch(mesh, batch), jax.random.PRNGKey(7)
    )

    np.testing.assert_allclose(
        float(logs8["total"]), float(logs1["total"]), rtol=1e-5, atol=1e-6
    )
    # Adam normalizes by sqrt(v): where a gradient is ~0, the psum's
    # different reduction order can flip the update sign, so per-weight
    # differences are bounded by ~2*lr (2e-4) rather than float eps.
    # The loss equality above plus this bound is the DP-correctness claim.
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1[0]),
        jax.tree_util.tree_leaves_with_path(s8[0]),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=0,
            err_msg=jax.tree_util.keystr(p1),
        )
    # batch stats (global-batch reduction) must agree too
    for a, b in zip(
        jax.tree_util.tree_leaves(s1[1]), jax.tree_util.tree_leaves(s8[1])
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_seed_sweep_real_hallucidet_module():
    def factory(seed):
        m = _module(seed)
        state = (
            m.ed_variables["params"],
            m.ed_variables.get("batch_stats", {}),
            m.opt_state,
        )
        return m, state

    mesh = make_mesh(2)
    sweep = SeedSweep(factory, seeds=[0, 1], mesh=mesh)
    loaders = [[_batch(1)] for _ in range(2)]
    logs = sweep.run_epoch(loaders, max_steps=1)
    totals = np.asarray(logs["total"])
    assert totals.shape == (2,)
    assert np.isfinite(totals).all()
    # different seeds -> different params -> different losses
    assert abs(float(totals[0]) - float(totals[1])) > 1e-7
    # per-seed state extraction round-trips
    s0 = unstack_state(sweep.state, 0)
    leaf = jax.tree_util.tree_leaves(s0[0])[0]
    assert np.isfinite(np.asarray(leaf)).all()
