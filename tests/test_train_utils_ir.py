"""smp train-utils runner + classic IR preprocessing baseline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hallucidet_tpu.translation import create_model, ir_preproc, train_utils as TU


def test_train_epoch_reduces_loss():
    m = create_model("unet", encoder_name="resnet18", classes=1, head="identity")
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    y = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) > 0.5).astype(
        jnp.float32
    )
    variables = m.init(jax.random.PRNGKey(2), x, False)

    from hallucidet_tpu.translation.seg_losses import SoftBCEWithLogitsLoss

    loss = SoftBCEWithLogitsLoss()
    runner = TU.TrainEpoch(
        m, loss, metrics=[TU.IoU(), TU.Fscore()], variables=variables,
        optimizer=optax.adam(1e-3), verbose=False,
    )
    batches = [(np.asarray(x), np.asarray(y))] * 3
    logs1 = runner.run(batches)
    logs2 = runner.run(batches)
    assert logs2["loss"] < logs1["loss"]
    assert "iou_score" in logs1 and "fscore" in logs1

    val = TU.ValidEpoch(m, loss, [TU.Accuracy()], runner.variables, verbose=False)
    logs = val.run(batches)
    assert np.isfinite(logs["loss"]) and "accuracy" in logs


def test_meters_and_functional_metrics():
    meter = TU.AverageValueMeter()
    meter.add(1.0)
    meter.add(3.0)
    assert meter.mean == 2.0
    pr = jnp.asarray(np.array([[0.9, 0.1], [0.8, 0.2]]))
    gt = jnp.asarray(np.array([[1.0, 0.0], [1.0, 1.0]]))
    assert 0 < float(TU.iou(pr, gt, threshold=0.5)) < 1
    np.testing.assert_allclose(float(TU.accuracy(pr, gt, 0.5)), 0.75)
    np.testing.assert_allclose(float(TU.precision(pr, gt, threshold=0.5)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(TU.recall(pr, gt, threshold=0.5)), 2 / 3, atol=1e-4)


def test_ir_preproc_pipelines():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    inv = ir_preproc.invert(x)
    np.testing.assert_allclose(np.asarray(inv), 1.0 - np.asarray(x), atol=1e-6)

    stretched = ir_preproc.histogram_stretching_default(x)
    assert float(stretched.min()) >= -1e-6 and float(stretched.max()) <= 1 + 1e-6

    eq = ir_preproc.histogram_equalization(x)
    assert eq.shape == x.shape and 0 <= float(eq.min()) and float(eq.max()) <= 1

    blur = ir_preproc.gaussian_blur(x)
    assert blur.shape == x.shape
    # blur reduces variance
    assert float(jnp.var(blur)) < float(jnp.var(x))

    for name, fn in ir_preproc.PIPELINES.items():
        out = fn(x)
        assert out.shape == x.shape, name
        assert np.isfinite(np.asarray(out)).all(), name


def test_ir_preproc_equalization_matches_pil():
    from PIL import Image, ImageOps

    rng = np.random.RandomState(3)
    img8 = rng.randint(0, 255, (16, 16), np.uint8)
    want = np.asarray(ImageOps.equalize(Image.fromarray(img8))).astype(np.float32)
    got = (
        np.asarray(
            ir_preproc.histogram_equalization(
                jnp.asarray(img8[None, :, :, None].astype(np.float32) / 255.0)
            )
        )[0, :, :, 0]
        * 255.0
    )
    np.testing.assert_allclose(got, want, atol=1.0)
