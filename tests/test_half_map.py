"""mAP-level half-vs-f32 comparison (VERDICT r4 next #1c).

The loss-level half tests (test_half_detector.py) showed that end-to-end loss
deltas at RANDOM INIT are dominated by discrete sample-set divergence, not by
bf16 numerics. The accuracy-relevant question is the detection-quality one:
does the bf16 feature path change mAP on data the detector can actually
detect? This test overfits the small Faster R-CNN on two synthetic frames
with high-contrast boxes (loss 2.38 -> ~0.4 in 80 Adam steps), then computes
AP@50 through `metrics/mean_ap.py` for the f32 and half=True paths.

Measured on the CPU backend at the pinned seeds: f32 map_50 = 1.0,
bf16 map_50 = 1.0, delta = 0.0. The asserted bound (delta <= 0.1) leaves room
for backend-dependent NMS tie flips among near-duplicate detections; a bf16
path that actually degrades detection (wrong cast boundary, feature
truncation) fails it immediately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig, pad_targets
from hallucidet_tpu.metrics.mean_ap import MeanAveragePrecision

SMALL_DET = FasterRCNNConfig(
    num_classes=2, backbone="resnet18",
    rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
    rpn_post_nms_top_n_train=32, rpn_post_nms_top_n_test=32,
    rpn_nms_candidate_cap=128, box_batch_size_per_image=16,
    box_detections_per_img=5,
)


@pytest.mark.slow
def test_half_map_tracks_f32():
    det = FasterRCNN(SMALL_DET, image_size=(64, 64))
    v = det.init(jax.random.PRNGKey(0))

    # frames with high-contrast rectangles exactly at the GT boxes
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 96, 96, 3).astype(np.float32) * 0.2
    gt = [np.array([[10, 10, 44, 52]], np.float32),
          np.array([[30, 20, 70, 60]], np.float32)]
    for i, g in enumerate(gt):
        x1, y1, x2, y2 = g[0].astype(int)
        imgs[i, y1:y2, x1:x2, :] = 0.9
    imgs = jnp.asarray(imgs)
    targets = pad_targets(gt, [np.array([1]), np.array([1])], capacity=4)

    tx = optax.adam(1e-3)
    params = v["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            losses, _ = det.forward(
                {"params": p}, imgs, targets, train_det=True, rng=rng
            )
            return sum(losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(7)
    for _ in range(80):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    assert float(loss) < 1.5, "overfit failed; comparison would be vacuous"

    def map50(half):
        _, dets = det.forward(
            {"params": params}, imgs, targets, rng=jax.random.PRNGKey(9),
            half=half,
        )
        m = MeanAveragePrecision()
        m.update_padded(dets, targets)
        return m.compute()["map_50"]

    a, b = map50(False), map50(True)
    # the trained detector must actually detect (guard against a vacuous
    # 0-vs-0 comparison), and bf16 must not change detection quality
    assert a >= 0.5, f"f32 map_50 {a} — detector did not learn the fixture"
    assert abs(a - b) <= 0.1, f"half map_50 drifted: f32 {a} vs bf16 {b}"
