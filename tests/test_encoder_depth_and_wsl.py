"""Round-3 registry closure: the 4 Instagram-WSL resnext101 group widths
(reference: encoders/resnet.py:183-230) and encoder_depth in [3,5] through
create_model / Unet (reference: decoders/unet/model.py:21-28,59)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hallucidet_tpu.nn.encoders import encoder_names, get_encoder
from hallucidet_tpu.translation import create_model

WSL_NAMES = (
    "resnext101_32x4d", "resnext101_32x16d",
    "resnext101_32x32d", "resnext101_32x48d",
)


def test_registry_has_every_reference_name():
    names = set(encoder_names())
    for n in WSL_NAMES:
        assert n in names, n


@pytest.mark.parametrize("name", ["resnext101_32x4d", "resnext101_32x16d"])
def test_wsl_resnext_stage_shapes(name):
    enc, out_channels, _ = get_encoder(name)
    assert tuple(out_channels) == (3, 64, 256, 512, 1024, 2048)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    assert len(feats) == 6
    for f, ch, s in zip(feats, out_channels, (1, 2, 4, 8, 16, 32)):
        assert f.shape[-1] == ch and f.shape[1] == 64 // s, (name, f.shape)
    # grouped bottleneck width: conv2 of layer1 block 0 must be 32 groups
    # of width_per_group channels scaled by planes/64
    k = variables["params"]["layer1_0"]["conv2"]["kernel"]
    width = {"resnext101_32x4d": 128, "resnext101_32x16d": 512}[name]
    assert k.shape[-1] == width
    assert k.shape[-2] == width // 32  # grouped conv: Cin/groups


@pytest.mark.parametrize("depth", [3, 4])
def test_unet_encoder_depth(depth):
    m = create_model(
        "unet", encoder_name="resnet18", classes=3,
        encoder_depth=depth, decoder_channels=(256, 128, 64, 32, 16)[:depth],
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(1), x, False)
    y = m.apply(variables, x, False)
    assert y.shape == (1, 64, 64, 3)
    # decoder has exactly `depth` blocks
    blocks = [k for k in variables["params"]["decoder"] if k.startswith("block_")]
    assert len(blocks) == depth


def test_unet_depth_trains_one_step():
    m = create_model(
        "unet", encoder_name="resnet18", classes=3,
        encoder_depth=4, decoder_channels=(256, 128, 64, 32),
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    target = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(1), x, False)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p):
        out, upd = m.apply(
            {"params": p, "batch_stats": bs}, x, True, mutable=["batch_stats"]
        )
        return jnp.mean((out - target) ** 2), upd

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.isfinite(float(loss))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(new_params),
            jax.tree_util.tree_leaves(params),
        )
    )
    assert moved


def test_unet_depth_mismatch_raises():
    m = create_model(
        "unet", encoder_name="resnet18", classes=3, encoder_depth=4
    )
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="decoder_channels"):
        m.init(jax.random.PRNGKey(0), x, False)


def test_encoder_decoder_wrapper_depth():
    from hallucidet_tpu.translation.encoder_decoder import EncoderDecoder

    ed = EncoderDecoder(name="resnet18", encoder_depth=4)
    v = ed.init(jax.random.PRNGKey(0), sample_hw=(64, 64))
    y = ed.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert y.shape == (1, 64, 64, 3)
