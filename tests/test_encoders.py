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
        ("senet154", (3, 128, 256, 512, 1024, 2048)),
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


def test_senet_deep_variants_registered():
    # se_resnet101/152, se_resnext101: same channels, more blocks; verify
    # registry + factory without paying full-forward cost for each.
    for name in ("se_resnet101", "se_resnet152", "se_resnext101_32x4d"):
        enc, out_channels, _ = get_encoder(name)
        assert tuple(out_channels) == (3, 64, 256, 512, 1024, 2048)


def test_ceil_mode_max_pool_matches_torch_semantics():
    """MaxPool2d(3, stride=2, ceil_mode=True, padding=0): windows start at 0
    (not -1 as with padding=1) and the count is ceil((H-3)/2)+1."""
    from hallucidet_tpu.nn.encoders import ceil_mode_max_pool

    rng = np.random.RandomState(0)
    for h, w in [(64, 64), (63, 65), (7, 9), (150, 150)]:
        x = rng.randn(1, h, w, 2).astype(np.float32)
        got = np.asarray(ceil_mode_max_pool(jnp.asarray(x)))
        oh = -(-(h - 3) // 2) + 1
        ow = -(-(w - 3) // 2) + 1
        assert got.shape == (1, oh, ow, 2), (h, w, got.shape)
        # oracle: explicit window max with bottom/right-truncated windows
        for i in range(oh):
            for j in range(ow):
                win = x[0, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3, :]
                np.testing.assert_allclose(
                    got[0, i, j], win.max(axis=(0, 1)), rtol=1e-6
                )


def test_xception_stage5_ends_at_bn4_no_relu():
    # smp's deepest Xception stage is Sequential(..., conv4, bn4) — raw bn
    # output, so negatives must survive (reference: xception.py get_stages).
    enc, _, _ = get_encoder("xception")
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    assert float(feats[-1].min()) < 0.0


@pytest.mark.parametrize(
    "name,channels",
    [
        ("dpn68", (3, 10, 144, 320, 704, 832)),
        ("dpn68b", (3, 10, 144, 320, 704, 832)),
        ("dpn92", (3, 64, 336, 704, 1552, 2688)),
    ],
)
def test_dpn_shapes(name, channels):
    enc, out_channels, _ = get_encoder(name)
    assert tuple(out_channels) == channels
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    for f, ch, s in zip(feats, channels, (1, 2, 4, 8, 16, 32)):
        assert f.shape[-1] == ch, (name, f.shape, ch)
        assert f.shape[1] == 64 // s, f.shape
    # the deepest stage must include the conv5_bn_ac BatchNorm
    # (pretrainedmodels' trailing CatBnAct; reference dpn.py stage_idxs)
    assert "conv5_bn_ac_bn" in variables["params"]


def test_dpn_deep_variants_registered():
    for name in ("dpn98", "dpn107", "dpn131"):
        enc, out_channels, _ = get_encoder(name)
        assert len(out_channels) == 6


def test_resnext101_32x8d_registered():
    enc, out_channels, _ = get_encoder("resnext101_32x8d")
    assert tuple(out_channels) == (3, 64, 256, 512, 1024, 2048)


# ---------------------------------------------------------------------------
# round 2: inception + timm families (encoders_extra.py)
# ---------------------------------------------------------------------------

EXTRA_CASES = {
    # expected channels from the reference registry tables
    "inceptionv4": (3, 64, 192, 384, 1024, 1536),
    "inceptionresnetv2": (3, 64, 192, 320, 1088, 1536),
    "timm-resnest14d": (3, 64, 256, 512, 1024, 2048),
    "timm-resnest50d_4s2x40d": (3, 64, 256, 512, 1024, 2048),
    "timm-resnest50d_1s4x24d": (3, 64, 256, 512, 1024, 2048),
    "timm-res2net50_26w_4s": (3, 64, 256, 512, 1024, 2048),
    "timm-res2net50_48w_2s": (3, 64, 256, 512, 1024, 2048),
    "timm-skresnet18": (3, 64, 64, 128, 256, 512),
    "timm-skresnext50_32x4d": (3, 64, 256, 512, 1024, 2048),
    "timm-regnetx_002": (3, 32, 24, 56, 152, 368),
    "timm-regnety_002": (3, 32, 24, 56, 152, 368),
    "timm-gernet_s": (3, 13, 48, 48, 384, 1920),
    "timm-mobilenetv3_large_100": (3, 16, 24, 40, 112, 960),
    "timm-mobilenetv3_small_075": (3, 16, 16, 24, 40, 432),
    "timm-mobilenetv3_large_minimal_100": (3, 16, 24, 40, 112, 960),
    "efficientnet-b4": (3, 48, 32, 56, 160, 448),
    "mit_b3": (3, 0, 64, 128, 320, 512),
    "densenet161": (3, 96, 384, 768, 2112, 2208),
}


@pytest.mark.parametrize("name", sorted(EXTRA_CASES))
def test_extra_encoder_feature_shapes(name):
    channels = EXTRA_CASES[name]
    enc, out_channels, _ = get_encoder(name)
    assert tuple(out_channels) == channels, (out_channels, channels)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    assert len(feats) == 6
    for f, ch, s in zip(feats, channels, (1, 2, 4, 8, 16, 32)):
        assert f.shape[-1] == ch, (name, f.shape, ch)
        assert f.shape[1] == 64 // s, (name, f.shape)


def test_regnet_width_schedule_matches_reference_tables():
    """The parametric width generator must reproduce every out_channels row
    of reference timm_regnet.py."""
    from hallucidet_tpu.nn.encoders_extra import _REGNET_CFG, regnet_out_channels

    expected = {
        "timm-regnetx_002": (3, 32, 24, 56, 152, 368),
        "timm-regnetx_004": (3, 32, 32, 64, 160, 384),
        "timm-regnetx_006": (3, 32, 48, 96, 240, 528),
        "timm-regnetx_008": (3, 32, 64, 128, 288, 672),
        "timm-regnetx_016": (3, 32, 72, 168, 408, 912),
        "timm-regnetx_032": (3, 32, 96, 192, 432, 1008),
        "timm-regnetx_040": (3, 32, 80, 240, 560, 1360),
        "timm-regnetx_064": (3, 32, 168, 392, 784, 1624),
        "timm-regnetx_080": (3, 32, 80, 240, 720, 1920),
        "timm-regnetx_120": (3, 32, 224, 448, 896, 2240),
        "timm-regnetx_160": (3, 32, 256, 512, 896, 2048),
        "timm-regnetx_320": (3, 32, 336, 672, 1344, 2520),
        "timm-regnety_002": (3, 32, 24, 56, 152, 368),
        "timm-regnety_004": (3, 32, 48, 104, 208, 440),
        "timm-regnety_006": (3, 32, 48, 112, 256, 608),
        "timm-regnety_008": (3, 32, 64, 128, 320, 768),
        "timm-regnety_016": (3, 32, 48, 120, 336, 888),
        "timm-regnety_032": (3, 32, 72, 216, 576, 1512),
        "timm-regnety_040": (3, 32, 128, 192, 512, 1088),
        "timm-regnety_064": (3, 32, 144, 288, 576, 1296),
        "timm-regnety_080": (3, 32, 168, 448, 896, 2016),
        "timm-regnety_120": (3, 32, 224, 448, 896, 2240),
        "timm-regnety_160": (3, 32, 224, 448, 1232, 3024),
        "timm-regnety_320": (3, 32, 232, 696, 1392, 3712),
    }
    assert set(expected) == set(_REGNET_CFG)
    for name, chs in expected.items():
        assert regnet_out_channels(name) == chs, name


def test_tu_prefix_resolves_to_native_registry():
    enc, chs, _ = get_encoder("tu-resnest14d")
    assert tuple(chs) == (3, 64, 256, 512, 1024, 2048)
    enc, chs, _ = get_encoder("tu-resnet34")
    assert tuple(chs) == (3, 64, 64, 128, 256, 512)
    with pytest.raises(KeyError, match="no native equivalent"):
        get_encoder("tu-vit_base_patch16_224")


def test_reference_registry_surface_complete():
    """Every encoder name in the reference smp registry must resolve."""
    names = set(encoder_names())
    reference_names = [
        # resnet.py
        "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
        "resnext50_32x4d", "resnext101_32x8d",
        # dpn.py / senet.py / vgg / densenet / inception / mobilenet /
        # xception / efficientnet / mit / timm families
        "dpn68", "dpn68b", "dpn92", "dpn98", "dpn107", "dpn131",
        "senet154", "se_resnet50", "se_resnet101", "se_resnet152",
        "se_resnext50_32x4d", "se_resnext101_32x4d",
        "vgg11", "vgg11_bn", "vgg13", "vgg13_bn", "vgg16", "vgg16_bn",
        "vgg19", "vgg19_bn",
        "densenet121", "densenet169", "densenet201", "densenet161",
        "inceptionresnetv2", "inceptionv4",
        "mobilenet_v2", "xception",
        "efficientnet-b0", "efficientnet-b1", "efficientnet-b2",
        "efficientnet-b3", "efficientnet-b4", "efficientnet-b5",
        "efficientnet-b6", "efficientnet-b7",
        "mit_b0", "mit_b1", "mit_b2", "mit_b3", "mit_b4", "mit_b5",
        "timm-resnest14d", "timm-resnest26d", "timm-resnest50d",
        "timm-resnest101e", "timm-resnest200e", "timm-resnest269e",
        "timm-resnest50d_4s2x40d", "timm-resnest50d_1s4x24d",
        "timm-res2net50_26w_4s", "timm-res2net101_26w_4s",
        "timm-res2net50_26w_6s", "timm-res2net50_26w_8s",
        "timm-res2net50_48w_2s", "timm-res2net50_14w_8s", "timm-res2next50",
        "timm-regnetx_002", "timm-regnetx_004", "timm-regnetx_006",
        "timm-regnetx_008", "timm-regnetx_016", "timm-regnetx_032",
        "timm-regnetx_040", "timm-regnetx_064", "timm-regnetx_080",
        "timm-regnetx_120", "timm-regnetx_160", "timm-regnetx_320",
        "timm-regnety_002", "timm-regnety_004", "timm-regnety_006",
        "timm-regnety_008", "timm-regnety_016", "timm-regnety_032",
        "timm-regnety_040", "timm-regnety_064", "timm-regnety_080",
        "timm-regnety_120", "timm-regnety_160", "timm-regnety_320",
        "timm-skresnet18", "timm-skresnet34", "timm-skresnext50_32x4d",
        "timm-mobilenetv3_large_075", "timm-mobilenetv3_large_100",
        "timm-mobilenetv3_large_minimal_100", "timm-mobilenetv3_small_075",
        "timm-mobilenetv3_small_100", "timm-mobilenetv3_small_minimal_100",
        "timm-gernet_s", "timm-gernet_m", "timm-gernet_l",
    ]
    missing = [n for n in reference_names if n not in names]
    assert not missing, f"missing encoders: {missing}"
