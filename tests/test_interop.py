"""Interop tests: numerical parity of converted weights against torch.nn
reference computations (torch CPU is available; torchvision is not, so the
reference modules are built from torch.nn primitives here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from hallucidet_tpu.interop import torch_loader
from hallucidet_tpu.interop.torch_loader import (
    conv_kernel,
    convert_into_variables,
    dense_kernel,
    fc6_kernel,
)
from hallucidet_tpu.nn.layers import conv as flax_conv
from hallucidet_tpu.nn.resnet import BasicBlock


def test_conv_parity_stride_padding():
    """7x7 s2 p3 conv: torch vs flax with converted kernel."""
    tconv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        want = tconv(x).numpy()

    fconv = flax_conv(8, 7, 2, 3, use_bias=False)
    kernel = conv_kernel(tconv.weight.detach().numpy())
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = fconv.apply({"params": {"kernel": kernel}}, x_nhwc)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, atol=2e-5)


def test_batchnorm_eval_parity():
    tbn = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        tbn.weight.copy_(torch.randn(4))
        tbn.bias.copy_(torch.randn(4))
        tbn.running_mean.copy_(torch.randn(4))
        tbn.running_var.copy_(torch.rand(4) + 0.5)
    tbn.eval()
    x = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        want = tbn(x).numpy()

    from hallucidet_tpu.nn.layers import FrozenBatchNorm

    fbn = FrozenBatchNorm(4)
    variables = {
        "params": {
            "weight": tbn.weight.detach().numpy(),
            "bias": tbn.bias.detach().numpy(),
            "running_mean": tbn.running_mean.numpy(),
            "running_var": tbn.running_var.numpy(),
        }
    }
    got = fbn.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_fc6_flatten_order_parity():
    """torch flattens pooled RoI features as (C,H,W); we flatten (H,W,C)."""
    lin = torch.nn.Linear(256 * 7 * 7, 32)
    pooled = torch.randn(5, 256, 7, 7)
    with torch.no_grad():
        want = lin(pooled.flatten(1)).numpy()

    kernel = fc6_kernel(lin.weight.detach().numpy())
    bias = lin.bias.detach().numpy()
    pooled_nhwc = jnp.asarray(pooled.numpy().transpose(0, 2, 3, 1)).reshape(5, -1)
    got = pooled_nhwc @ jnp.asarray(kernel) + jnp.asarray(bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_dense_parity():
    lin = torch.nn.Linear(16, 8)
    x = torch.randn(3, 16)
    with torch.no_grad():
        want = lin(x).numpy()
    got = jnp.asarray(x.numpy()) @ jnp.asarray(
        dense_kernel(lin.weight.detach().numpy())
    ) + jnp.asarray(lin.bias.detach().numpy())
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_basic_block_parity():
    """Full residual block vs a torch.nn reimplementation (frozen BN)."""

    class TorchBasicBlock(torch.nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(cout)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(cout)
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

        def forward(self, x):
            idn = self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idn)

    tb = TorchBasicBlock(4, 8, 2)
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features) + 0.5)
                m.weight.copy_(torch.randn(m.num_features))
                m.bias.copy_(torch.randn(m.num_features))
    tb.eval()
    x = torch.randn(1, 4, 16, 16)
    with torch.no_grad():
        want = tb(x).numpy()

    fb = BasicBlock(planes=8, stride=2, downsample=True, frozen_bn=True)
    variables = fb.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4))
    )
    sd = {
        "conv1.weight": tb.conv1.weight.detach().numpy(),
        "conv2.weight": tb.conv2.weight.detach().numpy(),
        "downsample.0.weight": tb.downsample[0].weight.detach().numpy(),
    }
    for tname, tmod in (
        ("bn1", tb.bn1), ("bn2", tb.bn2), ("downsample.1", tb.downsample[1])
    ):
        sd[f"{tname}.weight"] = tmod.weight.detach().numpy()
        sd[f"{tname}.bias"] = tmod.bias.detach().numpy()
        sd[f"{tname}.running_mean"] = tmod.running_mean.numpy()
        sd[f"{tname}.running_var"] = tmod.running_var.numpy()

    new_vars, loaded, missing = convert_into_variables(dict(variables), sd)
    assert len(missing) == 0, missing
    got = fb.apply(new_vars, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
    )


def test_unet_key_map_is_total():
    """Every leaf of the Unet variable tree maps to a torch key: synthesize a
    state dict for exactly those keys and check nothing is reported missing."""
    from hallucidet_tpu.translation import create_model
    from hallucidet_tpu.interop import torch_loader as tl

    model = create_model("unet", encoder_name="resnet18", classes=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False
    )

    # build the expected torch state dict by inverse-transforming our leaves
    sd = {}
    for collection, tree in variables.items():
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in flat:
            segs = [p.key for p in kp]
            tkey = (
                tl._segments_to_torch(segs[:-1])
                + "."
                + tl._PARAM_SUFFIX.get(segs[-1], segs[-1])
            )
            arr = np.asarray(leaf)
            tf = tl._leaf_transform(segs[:-1], segs[-1], arr.shape)
            if tf == "conv":
                arr = arr.transpose(3, 2, 0, 1)
            elif tf in ("dense", "fc6"):
                arr = arr.transpose(1, 0)
            sd[tkey] = arr
    new_vars, loaded, missing = convert_into_variables(dict(variables), sd)
    assert missing == [], missing[:10]
    # round trip: values must be identical
    for (a, b) in zip(
        jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(new_vars)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_detector_key_map_is_total():
    from hallucidet_tpu.detection import FasterRCNN, FasterRCNNConfig
    from hallucidet_tpu.interop import torch_loader as tl

    det = FasterRCNN(
        FasterRCNNConfig(num_classes=2, backbone="resnet18"), image_size=(64, 64)
    )
    variables = det.init(jax.random.PRNGKey(0))
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for kp, leaf in flat:
        segs = [p.key for p in kp]
        tkey = (
            tl._segments_to_torch(segs[:-1], detector="fasterrcnn")
            + "."
            + tl._PARAM_SUFFIX.get(segs[-1], segs[-1])
        )
        arr = np.asarray(leaf)
        tf = tl._leaf_transform(segs[:-1], segs[-1], arr.shape)
        if tf == "conv":
            arr = arr.transpose(3, 2, 0, 1)
        elif tf == "fc6":
            # inverse of fc6_kernel: [in,out] -> [out,h,w,c] -> [out,c,h,w] -> flat
            out_f = arr.shape[1]
            a = arr.transpose(1, 0).reshape(out_f, 7, 7, 256)
            arr = a.transpose(0, 3, 1, 2).reshape(out_f, -1)
        elif tf == "dense":
            arr = arr.transpose(1, 0)
        sd[tkey] = arr
    new_vars, loaded, missing = convert_into_variables(
        dict(variables), sd, detector="fasterrcnn"
    )
    assert missing == [], missing[:10]
    expected_keys = {
        "backbone.body.conv1.weight",
        "rpn.head.conv.weight",
        "roi_heads.box_head.fc6.weight",
        "roi_heads.box_predictor.cls_score.weight",
        "backbone.fpn.inner_blocks.0.weight",
    }
    assert expected_keys <= set(sd.keys())


# ---------------------------------------------------------------------------
# negative paths (VERDICT weak #9): wrong checkpoints must fail loudly and
# report precisely, not load garbage silently.
# ---------------------------------------------------------------------------


def test_convert_shape_mismatch_raises():
    import flax.linen as fnn

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return fnn.Conv(4, (3, 3), name="conv1")(x)

    m = Tiny()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    # torch OIHW kernel with the WRONG in-channels (5 instead of 3)
    bad_sd = {
        "conv1.weight": np.zeros((4, 5, 3, 3), np.float32),
        "conv1.bias": np.zeros((4,), np.float32),
    }
    with pytest.raises(ValueError, match="shape mismatch for conv1.weight"):
        torch_loader.convert_into_variables(v, bad_sd)


def test_convert_reports_missing_keys_and_keeps_init():
    import flax.linen as fnn

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = fnn.Conv(4, (3, 3), name="conv1")(x)
            return fnn.Conv(2, (1, 1), name="conv2")(x)

    m = Tiny()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    sd = {
        "conv1.weight": np.ones((4, 3, 3, 3), np.float32),
        "conv1.bias": np.zeros((4,), np.float32),
    }
    new_v, loaded, missing = torch_loader.convert_into_variables(v, sd)
    assert set(loaded) == {"conv1.weight", "conv1.bias"}
    assert "conv2.weight" in missing and "conv2.bias" in missing
    # strict=False: unmatched leaves keep their initialized values
    np.testing.assert_array_equal(
        new_v["params"]["conv2"]["kernel"], v["params"]["conv2"]["kernel"]
    )
    np.testing.assert_allclose(new_v["params"]["conv1"]["kernel"], 1.0)


def test_load_detector_rejects_unrelated_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    # an adversarial state dict: right-looking prefixes, no matching keys
    sd = {"detector.detector.banana.weight": torch.zeros(3),
          "something.else": torch.ones(2)}
    p = tmp_path / "junk.bin"
    torch.save(sd, str(p))
    with pytest.raises(ValueError, match="no detector weights matched"):
        torch_loader.load_detector_variables(str(p), "fasterrcnn")
