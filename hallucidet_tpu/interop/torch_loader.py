"""torch checkpoint -> JAX pytree conversion.

The reference ships published weights as Lightning `.ckpt` / raw `.bin` torch
state dicts (reference: src/models/detector.py:69-79, eval_hallucidet.py:
199-213 `load_from_checkpoint(strict=False)`, README HF-hosted ckpts). This
module maps those onto the framework's Flax variable trees:

- conv kernels OIHW -> HWIO;
- linear weights [out, in] -> [in, out];
- the Fast R-CNN fc6 additionally permutes its input columns from the torch
  CHW-flatten order to this build's NHWC (h, w, c) flatten order
  (see detection/faster_rcnn.py FasterRCNNModule.box_predict);
- BatchNorm -> params(scale, bias) + batch_stats(mean, var); FrozenBatchNorm
  (detector trunks) keeps weight/bias/running_mean/running_var as params;
- Lightning checkpoints are unwrapped ('state_dict', `encoder_decoder.*` /
  `detector.*` prefixes) with strict=False semantics: missing keys keep their
  initialized values and are reported.

Key-name mapping is rule-based: every Flax module in nn/ and detection/ names
its submodules after the corresponding torch layer (layer2_1 <-> layer2.1,
cSE_1 <-> cSE.1, inner_0 <-> inner_blocks.0, ...).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# torch is import-gated: conversion is a host-side, offline operation.


def _torch():
    import torch

    return torch


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    torch = _torch()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "cpu")}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w, (1, 0))


def fc6_kernel(w: np.ndarray, pooled_hw: Tuple[int, int] = (7, 7), channels: int = 256):
    """torch fc6 flattens (C, H, W); this build flattens (H, W, C)."""
    out_f, in_f = w.shape
    h, win = pooled_hw
    w4 = w.reshape(out_f, channels, h, win)
    w4 = np.transpose(w4, (0, 2, 3, 1))  # [out, h, w, c]
    return np.transpose(w4.reshape(out_f, in_f), (1, 0))


# ---------------------------------------------------------------------------
# flax path -> torch key rules
# ---------------------------------------------------------------------------

_LAYER_RE = re.compile(r"^layer(\d+)_(\d+)$")
_TOWER_RE = re.compile(r"^(cls|reg)_tower_(\d+)$")
_GN_RE = re.compile(r"^(cls|reg)_gn_(\d+)$")
_INNER_RE = re.compile(r"^inner_(\d+)$")
_LAYERB_RE = re.compile(r"^layer_(\d+)$")
_BLOCK_RE = re.compile(r"^block_(\d+)$")


def _segments_to_torch(
    path: List[str], detector: Optional[str] = None, fcos_gn: bool = False
) -> str:
    """Translate a Flax module path into the matching torch module path."""
    out: List[str] = []
    i = 0
    while i < len(path):
        seg = path[i]
        m = _LAYER_RE.match(seg)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
        elif seg.startswith("downsample_"):
            out.append("downsample." + seg.split("_")[1])
        elif seg == "bn":  # flax BatchNorm wrapper inner module
            pass
        elif _INNER_RE.match(seg):
            out.append(f"inner_blocks.{seg.split('_')[1]}")
        elif _LAYERB_RE.match(seg):
            out.append(f"layer_blocks.{seg.split('_')[1]}")
        elif seg in ("p6", "p7"):
            out.append(f"extra_blocks.{seg}")
        elif _BLOCK_RE.match(seg):
            out.append(f"blocks.{seg.split('_')[1]}")
        elif _TOWER_RE.match(seg):
            kind, idx = _TOWER_RE.match(seg).groups()
            mult = 3 if fcos_gn else 2
            head = "classification_head" if kind == "cls" else "regression_head"
            out.append(f"head.{head}.conv.{int(idx) * mult}")
        elif _GN_RE.match(seg):
            kind, idx = _GN_RE.match(seg).groups()
            head = "classification_head" if kind == "cls" else "regression_head"
            out.append(f"head.{head}.conv.{int(idx) * 3 + 1}")
        elif seg == "cls_logits":
            out.append(
                "head.classification_head.cls_logits" if detector else "cls_logits"
            )
        elif seg == "bbox_reg":
            out.append("head.regression_head.bbox_reg")
        elif seg == "bbox_ctrness":
            out.append("head.regression_head.bbox_ctrness")
        elif seg in ("rpn_conv", "rpn_cls_logits", "rpn_bbox_pred"):
            out.append("rpn.head." + seg.replace("rpn_", "", 1))
        elif seg in ("fc6", "fc7"):
            out.append(f"roi_heads.box_head.{seg}")
        elif seg in ("cls_score", "bbox_pred"):
            out.append(f"roi_heads.box_predictor.{seg}")
        elif seg == "body":
            out.append("backbone.body")
        elif seg == "fpn":
            out.append("backbone.fpn")
        elif "_" in seg and seg.split("_")[-1].isdigit() and seg[0] in "cs":
            # cSE_1 / sSE_0 attention convs
            base, idx = seg.rsplit("_", 1)
            out.append(f"{base}.{idx}")
        else:
            out.append(seg)
        i += 1
    return ".".join(out)


_PARAM_SUFFIX = {
    "kernel": "weight",
    "bias": "bias",
    "scale": "weight",  # BatchNorm/GroupNorm scale
    "weight": "weight",  # FrozenBatchNorm
    "running_mean": "running_mean",
    "running_var": "running_var",
    "mean": "running_mean",  # flax batch_stats
    "var": "running_var",
    "embedding": "weight",
}


def _leaf_transform(path: List[str], leaf_name: str, value_shape) -> str:
    """Which transform a torch tensor needs for this flax leaf."""
    if leaf_name == "kernel":
        if len(value_shape) == 4:
            return "conv"
        if path and path[-1] == "fc6":
            return "fc6"
        return "dense"
    return "none"


def _flax_key(
    mod_path: List[str],
    leaf_name: str,
    prefix: str,
    detector: Optional[str],
    fcos_gn: bool,
    encoder_name: Optional[str],
    encoder_root: Optional[str],
) -> Tuple[str, Optional[str]]:
    """(torch key, special) for one flax leaf. Encoder subtrees route
    through the family-aware map (interop/encoder_keymap.py) so the emitted
    keys match the REAL upstream layouts (torchvision / pretrainedmodels /
    efficientnet-pytorch / timm / vendored MiT) rather than the generic
    name_N -> name.N heuristic. `special` marks value-level transforms
    (MiT's fused kv linear)."""
    special = None
    if encoder_name is not None:
        from hallucidet_tpu.interop.encoder_keymap import (
            encoder_segments_to_torch,
            has_family_mapping,
        )

        def strip_wrapper(segs):
            # the flax BatchNorm WRAPPER's inner nn.BatchNorm is named "bn"
            # and is always the last module segment; strip only that — real
            # torch modules named `bn` exist (pretrainedmodels BnActConv2d /
            # BasicConv2d children).
            return segs[:-1] if segs and segs[-1] == "bn" else segs

        if has_family_mapping(encoder_name):
            if encoder_root is None:
                tpath, special = encoder_segments_to_torch(
                    encoder_name, strip_wrapper(mod_path)
                )
                return (
                    prefix + tpath + "." + _PARAM_SUFFIX.get(leaf_name, leaf_name),
                    special,
                )
            if mod_path and mod_path[0] == encoder_root:
                sub = strip_wrapper(mod_path[1:])
                tpath, special = encoder_segments_to_torch(encoder_name, sub)
                return (
                    prefix
                    + encoder_root
                    + "."
                    + tpath
                    + "."
                    + _PARAM_SUFFIX.get(leaf_name, leaf_name),
                    special,
                )
    return (
        prefix
        + _segments_to_torch(mod_path, detector, fcos_gn)
        + "."
        + _PARAM_SUFFIX.get(leaf_name, leaf_name),
        special,
    )


def _kv_slice(t: np.ndarray, special: str) -> np.ndarray:
    """Row-slice of the fused MiT kv tensor for our separate k/v modules."""
    d = t.shape[0] // 2
    return t[:d] if special == "kv_k" else t[d:]


def convert_into_variables(
    variables: Dict[str, Any],
    torch_sd: Dict[str, np.ndarray],
    prefix: str = "",
    detector: Optional[str] = None,
    encoder_name: Optional[str] = None,
    encoder_root: Optional[str] = "encoder",
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Fill a Flax variable tree from a torch state dict.

    Returns (new_variables, loaded_keys, missing_torch_keys). strict=False:
    leaves without a matching torch tensor keep their current value. When
    `encoder_name` is given, leaves under `encoder_root` (or the whole tree
    if encoder_root is None) use the family-aware upstream key map.
    """
    import jax

    fcos_gn = detector == "fcos"
    loaded: List[str] = []
    missing: List[str] = []

    def convert_collection(tree, collection: str):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        out_leaves = []
        for kp, leaf in flat[0]:
            segs = [p.key for p in kp]
            leaf_name = segs[-1]
            mod_path = segs[:-1]
            torch_key, special = _flax_key(
                mod_path, leaf_name, prefix, detector, fcos_gn,
                encoder_name, encoder_root,
            )
            if torch_key in torch_sd:
                t = torch_sd[torch_key]
                if special in ("kv_k", "kv_v"):
                    t = _kv_slice(t, special)
                tf = _leaf_transform(mod_path, leaf_name, np.shape(t))
                if tf == "conv":
                    t = conv_kernel(t)
                elif tf == "fc6":
                    t = fc6_kernel(t)
                elif tf == "dense":
                    t = dense_kernel(t)
                if tuple(t.shape) != tuple(np.shape(leaf)):
                    raise ValueError(
                        f"shape mismatch for {torch_key}: torch {t.shape} vs "
                        f"flax {np.shape(leaf)} at {'/'.join(segs)}"
                    )
                out_leaves.append(np.asarray(t, dtype=np.asarray(leaf).dtype))
                loaded.append(torch_key)
            else:
                missing.append(torch_key)
                out_leaves.append(leaf)
        return jax.tree_util.tree_unflatten(flat[1], out_leaves)

    new_vars = {c: convert_collection(t, c) for c, t in variables.items()}
    return new_vars, loaded, missing


# ---------------------------------------------------------------------------
# high-level entry points
# ---------------------------------------------------------------------------


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }


def load_detector_variables(path: str, detector_name: str, n_classes: int = 2):
    """Load a detector `.bin`/`.ckpt` into fresh detector variables."""
    from hallucidet_tpu.detection import Detector
    import jax

    det = Detector(name=detector_name, n_classes=n_classes)
    variables = det.init(jax.random.PRNGKey(0))
    sd = load_torch_state_dict(path)
    # Lightning DetectorLit stores the detector under 'detector.detector.'
    for prefix in ("detector.detector.", "detector.", ""):
        candidate = strip_prefix(sd, prefix) if prefix else sd
        if any(k.startswith(("backbone.", "rpn.", "head.", "roi_heads.")) for k in candidate):
            sd = candidate
            break
    new_vars, loaded, missing = convert_into_variables(
        variables, sd, detector=det.name
    )
    if not loaded:
        raise ValueError(f"no detector weights matched in {path}")
    return new_vars


def load_encoder_decoder_variables(
    path: str,
    arch: str = "unet",
    encoder_name: str = "resnet34",
    classes: int = 3,
    head: str = "sigmoid",
    sample_hw: Tuple[int, int] = (96, 128),
):
    """Load the hallucination net from a Lightning `.ckpt` (strict=False)."""
    from hallucidet_tpu.translation import create_model
    import jax
    import jax.numpy as jnp

    model = create_model(arch=arch, encoder_name=encoder_name, classes=classes, head=head)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *sample_hw, 3), jnp.float32), False
    )
    sd = load_torch_state_dict(path)
    for prefix in ("encoder_decoder.encoder_decoder.", "encoder_decoder.", ""):
        candidate = strip_prefix(sd, prefix) if prefix else sd
        if any(k.startswith(("encoder.", "decoder.", "segmentation_head.")) for k in candidate):
            sd = candidate
            break
    new_vars, loaded, missing = convert_into_variables(
        dict(variables), sd, encoder_name=encoder_name
    )
    if not loaded:
        raise ValueError(f"no encoder-decoder weights matched in {path}")
    return new_vars


def synthesize_torch_state_dict(
    variables: Dict[str, Any],
    prefix: str = "",
    detector: Optional[str] = None,
    encoder_name: Optional[str] = None,
    encoder_root: Optional[str] = "encoder",
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_into_variables`, for exercising the full
    converter->eval chain without real torch checkpoints (zero-egress smoke;
    scripts/parity_llvip.py --smoke) and for proving the key map total per
    encoder family (tests/test_interop_zoo.py): emits a torch-layout state
    dict — real upstream key names when `encoder_name` is given — whose
    conversion reproduces `variables` bit-exactly."""
    import jax

    fcos_gn = detector == "fcos"
    sd: Dict[str, np.ndarray] = {}
    kv_halves: Dict[str, Dict[str, np.ndarray]] = {}
    for collection, tree in variables.items():
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            segs = [p.key for p in kp]
            leaf_name = segs[-1]
            mod_path = segs[:-1]
            torch_key, special = _flax_key(
                mod_path, leaf_name, prefix, detector, fcos_gn,
                encoder_name, encoder_root,
            )
            w = np.asarray(leaf)
            if leaf_name == "kernel":
                if w.ndim == 4:
                    w = np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW
                elif mod_path and mod_path[-1] == "fc6":
                    in_f, out_f = w.shape
                    w4 = np.transpose(w, (1, 0)).reshape(
                        out_f, 7, 7, in_f // 49
                    )
                    w = np.transpose(w4, (0, 3, 1, 2)).reshape(out_f, in_f)
                else:
                    w = np.transpose(w, (1, 0))
            if special in ("kv_k", "kv_v"):
                kv_halves.setdefault(torch_key, {})[special] = w
            else:
                sd[torch_key] = w
    for torch_key, halves in kv_halves.items():
        # fused MiT kv linear: torch rows are [k-rows; v-rows]
        sd[torch_key] = np.concatenate([halves["kv_k"], halves["kv_v"]], axis=0)
    return sd


def patch_first_conv(params, new_in_channels: int, first_conv_path=("encoder", "conv1")):
    """Adapt a converted first-conv kernel to a different input channel count
    (reference: src/segmentation_models/encoders/_utils.py:5-38
    patch_first_conv): 1 channel -> sum the kernel over input channels;
    otherwise tile and rescale so activation magnitudes are preserved.
    """
    import jax

    node = params
    for key in first_conv_path:
        node = node[key]
    kernel = np.asarray(node["kernel"])  # [kh, kw, Cin, O]
    cin = kernel.shape[2]
    if new_in_channels == cin:
        return params
    if new_in_channels == 1:
        new_kernel = kernel.sum(axis=2, keepdims=True)
    else:
        reps = -(-new_in_channels // cin)
        new_kernel = np.tile(kernel, (1, 1, reps, 1))[:, :, :new_in_channels, :]
        new_kernel = new_kernel * (cin / new_in_channels)

    def replace(tree, path, value):
        if not path:
            out = dict(tree)
            out["kernel"] = value
            return out
        out = dict(tree)
        out[path[0]] = replace(tree[path[0]], path[1:], value)
        return out

    return replace(params, list(first_conv_path), new_kernel)


def load_encoder_npz(path: str):
    """Load a scripts/convert_encoder.py artifact -> encoder variables dict
    ({"params": ..., "batch_stats": ...} as present). The npz stores flax
    tree paths joined with "/" and values already in flax layout."""
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for key in data.files:
        if key.startswith("__meta__"):
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def merge_encoder_variables(variables: Dict[str, Any], encoder_vars: Dict[str, Any],
                            encoder_root: str = "encoder") -> Dict[str, Any]:
    """Replace the `encoder_root` subtree of a model's variables with
    converted pretrained weights (shape-checked leaf-for-leaf)."""
    import jax

    out = {}
    for collection, tree in variables.items():
        sub = encoder_vars.get(collection)
        if sub is None or encoder_root not in tree:
            out[collection] = tree
            continue
        cur = tree[encoder_root]
        ref_leaves = jax.tree_util.tree_flatten_with_path(cur)[0]
        new_leaves = dict(
            ("/".join(p.key for p in kp), leaf)
            for kp, leaf in jax.tree_util.tree_flatten_with_path(sub)[0]
        )
        for kp, leaf in ref_leaves:
            key = "/".join(p.key for p in kp)
            if key not in new_leaves:
                raise ValueError(f"pretrained encoder npz is missing {key}")
            if tuple(np.shape(new_leaves[key])) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"pretrained encoder shape mismatch at {key}: "
                    f"{np.shape(new_leaves[key])} vs {np.shape(leaf)}"
                )
        out[collection] = {**tree, encoder_root: sub}
    return out
