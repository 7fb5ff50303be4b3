"""Model-zoo smoke tests: every smp arch builds, runs, outputs the right
shape and (sigmoid head) range."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.translation import create_model

ARCHS = [
    "unet",
    "unetmodified",
    "unetplusplus",
    "manet",
    "linknet",
    "fpn",
    "pspnet",
    "pan",
    "deeplabv3",
    "deeplabv3plus",
]


@pytest.mark.parametrize("arch", ARCHS)
def test_arch_forward(arch):
    m = create_model(arch, encoder_name="resnet18", classes=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(1), x, False)
    y = m.apply(variables, x, False)
    assert y.shape == (1, 64, 64, 3), arch
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0, arch


def test_aux_classification_head():
    m = create_model("fpn", encoder_name="resnet18", classes=3, aux_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, False)
    masks, labels = m.apply(variables, x, False)
    assert masks.shape == (1, 64, 64, 3)
    assert labels.shape == (1, 5)


def test_dilated_encoder_output_stride():
    from hallucidet_tpu.nn.resnet import ResNet

    m = ResNet(arch="resnet18", output_stride=8)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    # layer2 keeps stride 8; layers 3/4 dilate instead of downsampling
    assert feats[3].shape[1:3] == (8, 8)
    assert feats[4].shape[1:3] == (8, 8)
    assert feats[5].shape[1:3] == (8, 8)
