#!/usr/bin/env python
"""Offline pretrained-encoder weight converter: torch checkpoint -> .npz.

The reference's `encoder_weights="imagenet"` default downloads upstream
checkpoints and loads them straight into the vendored encoder modules
(reference: src/segmentation_models/encoders/__init__.py:62-85). This
zero-egress build splits that into an offline step: on any torch host run

    python scripts/convert_encoder.py \
        --encoder densenet161 \
        --torch densenet161-8d451a50.pth \
        --out densenet161_imagenet.npz [--in-channels 1]

and ship the .npz; at runtime pass it as `encoder_weights=` to
EncoderDecoder / create_model (translation/encoder_decoder.py) or load it
with `hallucidet_tpu.interop.load_encoder_npz`.

npz schema: flat keys "<collection>/<module>/.../<leaf>" (flax tree paths
joined with "/"), values already in flax layout (HWIO convs, [in,out]
dense), plus "__meta__/encoder" and "__meta__/in_channels" string entries.
Conversion is strict for the encoder map: any flax leaf without a matching
torch key aborts (the family key maps are totality-tested per family in
tests/test_interop_zoo.py, so a miss means a wrong/foreign checkpoint).
"""

import argparse
import sys

import numpy as np


def flatten_tree(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_tree(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def unflatten_tree(flat):
    tree = {}
    for key, v in flat.items():
        if key.startswith("__meta__"):
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert(encoder, torch_path, out_path, in_channels=3, hw=(64, 64)):
    import jax
    import jax.numpy as jnp

    from hallucidet_tpu.interop import torch_loader as tl
    from hallucidet_tpu.nn.encoders import get_encoder

    enc, _, _ = get_encoder(encoder)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.float32), False
    )
    sd = tl.load_torch_state_dict(torch_path)
    # upstream checkpoints keep their classifier heads; our encoders have no
    # head params, so head keys are simply never requested.
    new_vars, loaded, missing = tl.convert_into_variables(
        dict(variables), sd, encoder_name=encoder, encoder_root=None
    )
    if missing:
        raise SystemExit(
            f"{len(missing)} flax leaves had no matching torch key "
            f"(wrong checkpoint for --encoder {encoder}?): {missing[:8]}"
        )
    if in_channels != 3:
        new_vars["params"] = tl.patch_first_conv(
            new_vars["params"], in_channels,
            first_conv_path=_first_conv_path(encoder, new_vars["params"]),
        )
    flat = flatten_tree(new_vars)
    flat["__meta__/encoder"] = np.asarray(encoder)
    flat["__meta__/in_channels"] = np.asarray(in_channels)
    np.savez(out_path, **flat)
    print(
        f"converted {len(loaded)} tensors for {encoder} -> {out_path} "
        f"({sum(v.nbytes for v in flat.values()) / 1e6:.1f} MB)"
    )
    return 0


def _first_conv_path(encoder, params):
    """Locate the first conv's param path for patch_first_conv (reference:
    encoders/_utils.py patch_first_conv walks modules for the first Conv2d;
    here the registry families have known stems)."""
    for candidates in (
        ("conv1",), ("conv1_0",), ("conv_0",), ("stem",), ("stem_conv",),
        ("conv0",), ("conv_stem",), ("layer0_conv1",), ("features_0", "conv"),
        ("conv2d_1a", "conv"), ("patch_embed0",),
    ):
        node = params
        ok = True
        for key in candidates:
            if not isinstance(node, dict) or key not in node:
                ok = False
                break
            node = node[key]
        if ok and isinstance(node, dict) and "kernel" in node:
            return candidates
    raise SystemExit(f"cannot locate first conv for {encoder}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--torch", required=True, help="upstream .pth/.bin")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--in-channels", type=int, default=3)
    args = ap.parse_args(argv)
    return convert(args.encoder, args.torch, args.out, args.in_channels)


if __name__ == "__main__":
    sys.exit(main())
