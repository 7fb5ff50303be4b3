"""Native LPIPS (losses/lpips.py): tower shapes vs the torchvision channel
specs, metric properties, gradients, selection surface, and the converted-
checkpoint loader (synthesized weights — no egress needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hallucidet_tpu.losses.lpips import (
    LPIPS,
    AlexFeatures,
    SqueezeFeatures,
    VGG16Features,
    load_lpips_npz,
)
from hallucidet_tpu.losses.losses import Reconstruction


@pytest.mark.parametrize(
    "tower_cls,channels",
    [
        (AlexFeatures, (64, 192, 384, 256, 256)),
        (VGG16Features, (64, 128, 256, 512, 512)),
        (SqueezeFeatures, (64, 128, 256, 384, 384, 512, 512)),
    ],
)
def test_tower_channels(tower_cls, channels):
    m = tower_cls()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert tuple(f.shape[-1] for f in feats) == channels


def test_lpips_metric_properties():
    m = LPIPS(net="alex")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, y)
    v = jax.tree_util.tree_map(jnp.abs, v)
    d_same = m.apply(v, x, x)
    d_diff = m.apply(v, x, y)
    d_flip = m.apply(v, y, x)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert float(d_diff.min()) > 0.0
    np.testing.assert_allclose(d_diff, d_flip, rtol=1e-5)


def test_selection_surface_and_gradients():
    for name in ("lpips_alexnet", "lpips_alex", "lpips_squeeze", "lpips_vgg"):
        fn = Reconstruction.select_loss_perceptual(name)
        assert callable(fn)
    fn = Reconstruction.select_loss_perceptual("lpips_alexnet")
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    y = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    val, g = jax.value_and_grad(lambda p: fn(x, p))(y)
    assert np.isfinite(float(val)) and float(val) > 0
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_npz_loader_roundtrip(tmp_path):
    m = LPIPS(net="alex")
    dummy = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), dummy, dummy)
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(v["params"]):
        key = "/".join(p.key for p in path)
        flat[key] = np.asarray(leaf)
    f = tmp_path / "lpips_alex.npz"
    np.savez(f, **flat)
    loaded = load_lpips_npz(str(f))
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path({"params": v["params"]}),
        jax.tree_util.tree_leaves_with_path(loaded),
    ):
        np.testing.assert_array_equal(a, b)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    d = m.apply(loaded, x, x * 0.5)
    assert np.isfinite(float(d[0]))


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_convert_lpips_script_roundtrip(net, tmp_path):
    """scripts/convert_lpips.py: build an lpips-package-shaped state dict
    from this model's own params (HWIO -> OIHW reversed), convert, reload,
    and require bit-exact equality — validates the torch-name mapping and
    the frozen npz schema end-to-end without egress."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_lpips", "scripts/convert_lpips.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    m = LPIPS(net=net)
    dummy = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(2), dummy, dummy)

    sd = {
        "scaling_layer.shift": np.array([-0.030, -0.088, -0.188]).reshape(1, 3, 1, 1),
        "scaling_layer.scale": np.array([0.458, 0.448, 0.450]).reshape(1, 3, 1, 1),
    }
    for path, leaf in jax.tree_util.tree_leaves_with_path(v["params"]):
        keys = [p.key for p in path]
        w = np.asarray(leaf)
        if keys[0] == "net":
            idx = keys[1].split("_")[1]
            sub = keys[2:-1]
            torch_key = ".".join(["net", "sliceX", idx, *sub, ""])
            if keys[-1] == "kernel":
                sd[torch_key + "weight"] = np.transpose(w, (3, 2, 0, 1))
            else:
                sd[torch_key + "bias"] = w
        else:  # lin<i>/kernel
            i = keys[0][3:]
            sd[f"lin{i}.model.1.weight"] = np.transpose(w, (3, 2, 0, 1))

    arrays = mod.convert_state_dict(sd)
    f = tmp_path / f"lpips_{net}.npz"
    np.savez(f, **arrays)
    loaded = load_lpips_npz(str(f))
    orig = jax.tree_util.tree_leaves_with_path({"params": v["params"]})
    got = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(orig) == len(got)
    for (p1, a), (p2, b) in zip(orig, got):
        assert jax.tree_util.keystr(p1) == jax.tree_util.keystr(p2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_random_fallback_warns(monkeypatch):
    from hallucidet_tpu.losses import lpips as lpips_mod

    monkeypatch.delenv("HALLUCIDET_LPIPS_WEIGHTS", raising=False)
    lpips_mod._build.cache_clear()
    with pytest.warns(UserWarning, match="RANDOM features"):
        lpips_mod._build("alex")
    lpips_mod._build.cache_clear()
