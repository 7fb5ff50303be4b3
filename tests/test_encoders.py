"""Encoder-zoo tests: staged feature shapes per family + Unet integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.nn.encoders import encoder_names, get_encoder
from hallucidet_tpu.translation import create_model

CASES = {
    # name -> expected (channels per stage, strides per stage)
    "resnet18": ((3, 64, 64, 128, 256, 512), (1, 2, 4, 8, 16, 32)),
    "resnext50_32x4d": ((3, 64, 256, 512, 1024, 2048), (1, 2, 4, 8, 16, 32)),
    "vgg13": ((64, 128, 256, 512, 512, 512), (1, 2, 4, 8, 16, 32)),
    "vgg16_bn": ((64, 128, 256, 512, 512, 512), (1, 2, 4, 8, 16, 32)),
    "mobilenet_v2": ((3, 16, 24, 32, 96, 1280), (1, 2, 4, 8, 16, 32)),
    "densenet121": ((3, 64, 256, 512, 1024, 1024), (1, 2, 4, 8, 16, 32)),
    "efficientnet-b0": ((3, 32, 24, 40, 112, 320), (1, 2, 4, 8, 16, 32)),
    "efficientnet-b2": ((3, 32, 24, 48, 120, 352), (1, 2, 4, 8, 16, 32)),
    "mit_b0": ((3, 0, 32, 64, 160, 256), (1, 2, 4, 8, 16, 32)),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_encoder_feature_shapes(name):
    channels, strides = CASES[name]
    enc, out_channels, _ = get_encoder(name)
    assert tuple(out_channels) == channels
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    assert len(feats) == 6
    for f, ch, s in zip(feats, channels, strides):
        assert f.shape[-1] == ch, (name, f.shape)
        assert f.shape[1] == 64 // s, (name, f.shape)


@pytest.mark.parametrize("name", ["vgg11", "mobilenet_v2", "mit_b0"])
def test_unet_with_alt_encoders(name):
    m = create_model("unet", encoder_name=name, classes=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(1), x, False)
    y = m.apply(variables, x, False)
    assert y.shape == (1, 64, 64, 3)


def test_registry_surface():
    names = encoder_names()
    assert "resnet34" in names and "vgg16_bn" in names and "mit_b2" in names
    with pytest.raises(KeyError, match="Wrong encoder name"):
        get_encoder("resnet999")


@pytest.mark.parametrize(
    "name,channels",
    [
        ("se_resnet50", (3, 64, 256, 512, 1024, 2048)),
        ("se_resnext50_32x4d", (3, 64, 256, 512, 1024, 2048)),
        ("xception", (3, 64, 128, 256, 728, 2048)),
    ],
)
def test_senet_xception_shapes(name, channels):
    enc, out_channels, _ = get_encoder(name)
    assert tuple(out_channels) == channels
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    assert len(feats) == 6
    for f, ch, s in zip(feats, channels, (1, 2, 4, 8, 16, 32)):
        assert f.shape[-1] == ch, (name, f.shape, ch)
        assert f.shape[1] == 64 // s, (name, f.shape)


def test_dpn68_shapes():
    enc, out_channels, _ = get_encoder("dpn68")
    assert tuple(out_channels) == (3, 10, 144, 320, 704, 832)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    for f, ch, s in zip(feats, out_channels, (1, 2, 4, 8, 16, 32)):
        assert f.shape[-1] == ch, (f.shape, ch)
        assert f.shape[1] == 64 // s, f.shape
