"""Family-aware flax-path -> torch-key mapping for the full encoder zoo.

The reference loads pretrained ImageNet weights for all 17 encoder families
straight into the vendored torch modules (reference:
src/segmentation_models/encoders/__init__.py:62-85 — `model_zoo.load_url`
into the encoder's own state dict). The torch key space therefore differs
per family: torchvision layouts (resnet/vgg/densenet/mobilenet_v2),
pretrainedmodels layouts (senet/xception/dpn/inceptionv4/inceptionresnetv2),
efficientnet-pytorch (`_conv_stem`, `_blocks.N._depthwise_conv`, ...), the
vendored SegFormer MiT (`patch_embed1.proj`, `block1.N.attn.kv`, ...), and
timm layouts (resnest/res2net/sknet/regnet/gernet/mobilenetv3).

`encoder_segments_to_torch(name, segs)` translates one flax module path
(excluding the leaf and any flax `bn` wrapper segment) into the matching
torch module path, returning `(torch_path, special)`. `special` marks
leaves that need a value-level transform beyond the layout transposes:
MiT's fused `kv` linear maps onto our separate `k`/`v` Dense modules by
row-slicing (`"kv_k"` / `"kv_v"`).

interop.torch_loader routes encoder subtrees through this module whenever
the encoder family is known; everything here is pure string logic so it is
also usable offline (scripts/convert_encoder.py) without jax.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

# ---------------------------------------------------------------------------
# family tables (duplicated minimal config; importing nn.encoders would pull
# jax into offline converter contexts)
# ---------------------------------------------------------------------------

_VGG_CFG = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}

_SENET_NAMES = {
    "senet154", "se_resnet50", "se_resnet101", "se_resnet152",
    "se_resnext50_32x4d", "se_resnext101_32x4d",
}

# pretrainedmodels xception Block.rep Sequential layout: with
# start_with_relu the list is [relu, sep, bn, relu, sep, bn, ...] (convs at
# 3r+1); block1 drops the leading relu (convs at 3r).
_XCEPTION_NO_LEAD_RELU = {"block1"}

_IDX = re.compile(r"^(.*?)_(\d+)$")


def _split_idx(seg: str) -> Optional[Tuple[str, int]]:
    m = _IDX.match(seg)
    if not m:
        return None
    return m.group(1), int(m.group(2))


# ---------------------------------------------------------------------------
# per-family mappers: flax segs -> torch module path
# ---------------------------------------------------------------------------


def _map_vgg(name: str, segs: List[str]) -> str:
    cfg = _VGG_CFG[name.replace("_bn", "")]
    batch_norm = name.endswith("_bn")
    positions, m = [], 0
    for item in cfg:
        if item == "M":
            m += 1
        else:
            positions.append(m)
            m += 3 if batch_norm else 2
    kind, idx = _split_idx(segs[0])
    if kind == "conv":
        return f"features.{positions[idx]}"
    if kind == "bn":
        return f"features.{positions[idx] + 1}"
    raise KeyError(f"vgg: unmapped flax segment {segs}")


_MBV2_SUB = {
    # torchvision InvertedResidual.conv Sequential indices
    False: {"expand": "conv.0.0", "expand_bn": "conv.0.1", "dw": "conv.1.0",
            "dw_bn": "conv.1.1", "project": "conv.2", "project_bn": "conv.3"},
    # features.1 (the t=1 block) has no expansion conv
    True: {"dw": "conv.0.0", "dw_bn": "conv.0.1", "project": "conv.1",
           "project_bn": "conv.2"},
}


def _map_mbv2(segs: List[str]) -> str:
    head = segs[0]
    if head == "stem":
        return "features.0.0"
    if head == "stem_bn":
        return "features.0.1"
    if head == "head":
        return "features.18.0"
    if head == "head_bn":
        return "features.18.1"
    kind, idx = _split_idx(head)
    assert kind == "block", segs
    return f"features.{idx}.{_MBV2_SUB[idx == 1][segs[1]]}"


def _map_densenet(segs: List[str]) -> str:
    head = segs[0]
    if head in ("conv0", "norm0", "norm5"):
        return f"features.{head}"
    m = re.match(r"^db(\d+)_l(\d+)$", head)
    if m:
        b, l = int(m.group(1)), int(m.group(2))
        return f"features.denseblock{b}.denselayer{l + 1}.{segs[1]}"
    m = re.match(r"^trans(\d+)_(norm|conv)$", head)
    if m:
        return f"features.transition{m.group(1)}.{m.group(2)}"
    raise KeyError(f"densenet: unmapped flax segment {segs}")


_EFFNET_SUB = {
    "expand": "_expand_conv", "expand_bn": "_bn0",
    "dw": "_depthwise_conv", "dw_bn": "_bn1",
    "se_reduce": "_se_reduce", "se_expand": "_se_expand",
    "project": "_project_conv", "project_bn": "_bn2",
}


def _map_effnet(segs: List[str]) -> str:
    head = segs[0]
    if head == "stem":
        return "_conv_stem"
    if head == "stem_bn":
        return "_bn0"
    kind, idx = _split_idx(head)
    assert kind == "block", segs
    return f"_blocks.{idx}.{_EFFNET_SUB[segs[1]]}"


def _map_mit(segs: List[str]) -> Tuple[str, Optional[str]]:
    head = segs[0]
    m = re.match(r"^patch_embed(\d+)$", head)
    if m:
        return f"patch_embed{int(m.group(1)) + 1}.proj", None
    m = re.match(r"^embed_norm(\d+)$", head)
    if m:
        return f"patch_embed{int(m.group(1)) + 1}.norm", None
    m = re.match(r"^stage_norm(\d+)$", head)
    if m:
        return f"norm{int(m.group(1)) + 1}", None
    m = re.match(r"^stage(\d+)_block(\d+)$", head)
    if not m:
        raise KeyError(f"mit: unmapped flax segment {segs}")
    base = f"block{int(m.group(1)) + 1}.{m.group(2)}"
    sub = segs[1]
    if sub in ("norm1", "norm2"):
        return f"{base}.{sub}", None
    if sub == "attn":
        leaf_mod = segs[2]
        if leaf_mod == "k":
            return f"{base}.attn.kv", "kv_k"
        if leaf_mod == "v":
            return f"{base}.attn.kv", "kv_v"
        if leaf_mod == "sr_norm":
            return f"{base}.attn.norm", None
        return f"{base}.attn.{leaf_mod}", None
    if sub == "mlp":
        leaf_mod = segs[2]
        if leaf_mod == "dwconv":
            return f"{base}.mlp.dwconv.dwconv", None
        return f"{base}.mlp.{leaf_mod}", None
    raise KeyError(f"mit: unmapped flax segment {segs}")


def _map_senet(segs: List[str]) -> str:
    out = []
    for i, seg in enumerate(segs):
        m = re.match(r"^layer0_(\w+)$", seg)
        if m:
            out.append(f"layer0.{m.group(1)}")
            continue
        m = re.match(r"^layer(\d+)_(\d+)$", seg)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
            continue
        m = re.match(r"^downsample_(\d+)$", seg)
        if m:
            out.append(f"downsample.{m.group(1)}")
            continue
        out.append(seg)  # conv1/bn1/.../se_module/fc1/fc2
    return ".".join(out)


def _map_xception(segs: List[str]) -> str:
    out = []
    i = 0
    while i < len(segs):
        seg = segs[i]
        if re.match(r"^block\d+$", seg):
            base = 0 if seg in _XCEPTION_NO_LEAD_RELU else 1
            out.append(seg)
            sub = segs[i + 1]
            # flax XceptionBlock children are sep{r}/bn{r} (no underscore)
            m = re.match(r"^(sep|bn)(\d+)$", sub)
            if sub == "skip":
                out.append("skip")
            elif sub == "skip_bn":
                out.append("skipbn")
            elif m and m.group(1) == "sep":
                out.append(f"rep.{3 * int(m.group(2)) + base}")
            elif m:
                out.append(f"rep.{3 * int(m.group(2)) + base + 1}")
            else:
                raise KeyError(f"xception: unmapped {segs}")
            i += 2
            continue
        if seg == "dw":
            out.append("conv1")  # pretrainedmodels SeparableConv2d depthwise
        elif seg == "pw":
            out.append("pointwise")
        else:
            out.append(seg)  # conv1/bn1/conv2/bn2/conv3/bn3/conv4/bn4
        i += 1
    return ".".join(out)


def _map_dpn(segs: List[str]) -> str:
    head = segs[0]
    if head == "stem_conv":
        return "features.conv1_1.conv"
    if head == "stem_bn":
        return "features.conv1_1.bn"
    if head == "conv5_bn_ac_bn":
        return "features.conv5_bn_ac.bn"
    m = re.match(r"^s(\d+)_b(\d+)$", head)
    if not m:
        raise KeyError(f"dpn: unmapped flax segment {segs}")
    si, bi = int(m.group(1)), int(m.group(2))
    base = f"features.conv{si + 2}_{bi + 1}"
    sub = segs[1]
    if sub == "c1x1_w":
        # stride-1 proj in stage 0, stride-2 'down' proj afterwards
        sub = "c1x1_w_s1" if si == 0 else "c1x1_w_s2"
    elif sub == "c1x1_c_bn":
        return f"{base}.c1x1_c.bn"
    rest = segs[2:]  # _BnActConv children bn/conv keep their names
    return ".".join([base, sub] + rest)


def _map_inceptionv4(segs: List[str]) -> str:
    head = segs[0]
    kind, idx = _split_idx(head) or (None, None)
    assert kind == "features", segs
    out = [f"features.{idx}"]
    for seg in segs[1:]:
        m = re.match(r"^branch(\d+)_(\w+)$", seg)
        if m and not (19 <= idx <= 21 and seg != "branch3_1"):
            # Sequential branches are dotted; Inception_C's named attributes
            # (branch1_0/branch1_1a/branch2_3b/...) keep their underscores,
            # except its branch3 which IS a Sequential (avgpool, conv).
            out.append(f"branch{m.group(1)}.{m.group(2)}")
        else:
            out.append(seg)
    return ".".join(out)


def _map_inceptionresnetv2(segs: List[str]) -> str:
    out = []
    for i, seg in enumerate(segs):
        if i == 0:
            m = re.match(r"^repeat_([12])_(\d+)$", seg)
            if m:
                out.append(f"repeat_{m.group(1)}.{m.group(2)}")
                continue
            m = re.match(r"^repeat_(\d+)$", seg)
            if m:
                out.append(f"repeat.{m.group(1)}")
                continue
            out.append(seg)  # conv2d_*/mixed_*/block8
            continue
        m = re.match(r"^branch(\d+)_(\w+)$", seg)
        if m:
            out.append(f"branch{m.group(1)}.{m.group(2)}")
        else:
            out.append(seg)  # branch0/conv2d/conv/bn
    return ".".join(out)


def _map_timm_resnet(avg_down: bool, segs: List[str]) -> str:
    out = []
    i = 0
    while i < len(segs):
        seg = segs[i]
        if seg == "downsample":
            # timm avg_down shortcut is Sequential(pool, conv, bn): the pool
            # holds no params so conv/bn sit at indices 1/2; plain shortcut
            # is Sequential(conv, bn) at 0/1.
            sub = segs[i + 1]
            kind, idx = _split_idx(sub)
            assert kind == "downsample", segs
            out.append(f"downsample.{idx + (1 if avg_down else 0)}")
            i += 2
            continue
        m = re.match(r"^conv1_(\d+)$", seg)
        if m:  # deep stem Sequential indices
            out.append(f"conv1.{m.group(1)}")
            i += 1
            continue
        m = re.match(r"^layer(\d+)_(\d+)$", seg)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
            i += 1
            continue
        m = re.match(r"^(paths)_(\d+)_(conv|bn)$", seg)
        if m:  # SelectiveKernel path ConvNormAct
            out.append(f"paths.{m.group(2)}.{m.group(3)}")
            i += 1
            continue
        m = re.match(r"^(convs|bns)_(\d+)$", seg)
        if m:  # Bottle2neck ModuleLists
            out.append(f"{m.group(1)}.{m.group(2)}")
            i += 1
            continue
        m = re.match(r"^attn_(fc_reduce|bn|fc_select)$", seg)
        if m:
            out.append(f"attn.{m.group(1)}")
            i += 1
            continue
        out.append(seg)  # conv1/bn1/conv2(+SplitAttn children)/conv3/bn3/...
        i += 1
    return ".".join(out)


def _map_regnet(segs: List[str]) -> str:
    out = []
    for seg in segs:
        m = re.match(r"^(stem|conv\d+|downsample)_(conv|bn)$", seg)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
            continue
        m = re.match(r"^se_(fc\d+)$", seg)
        if m:
            out.append(f"se.{m.group(1)}")
            continue
        m = re.match(r"^(s\d+)_(b\d+)$", seg)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
            continue
        out.append(seg)
    return ".".join(out)


def _map_gernet(segs: List[str]) -> str:
    head = segs[0]
    if head == "stem_conv":
        return "stem.conv"
    if head == "stem_bn":
        return "stem.bn"
    if head == "final_conv":
        return "final_conv.conv"
    if head == "final_bn":
        return "final_conv.bn"
    m = re.match(r"^stages_(\d+)_(\d+)$", head)
    if not m:
        raise KeyError(f"gernet: unmapped flax segment {segs}")
    si = int(m.group(1))
    base = f"stages.{si}.{m.group(2)}"
    sub = segs[1]
    # timm ByobNet names: BasicBlock conv1_kxk/conv2_kxk; BottleneckBlock
    # conv1_1x1/conv2_kxk/conv3_1x1 (gernet stages 0-1 basic, 2-4 bottle).
    basic = si < 2
    byob = {
        "conv1_conv": ("conv1_kxk.conv" if basic else "conv1_1x1.conv"),
        "conv1_bn": ("conv1_kxk.bn" if basic else "conv1_1x1.bn"),
        "conv2_conv": "conv2_kxk.conv",
        "conv2_bn": "conv2_kxk.bn",
        "conv3_conv": "conv3_1x1.conv",
        "conv3_bn": "conv3_1x1.bn",
        "shortcut_conv": "shortcut.conv",
        "shortcut_bn": "shortcut.bn",
    }
    return f"{base}.{byob[sub]}"


def _map_mnv3(segs: List[str]) -> str:
    head = segs[0]
    if head in ("conv_stem", "bn1"):
        return head
    m = re.match(r"^blocks_(\d+)_(\d+)_(conv|bn1)$", head)
    if m:  # 'cn' ConvBnAct block
        return f"blocks.{m.group(1)}.{m.group(2)}.{m.group(3)}"
    m = re.match(r"^blocks_(\d+)_(\d+)$", head)
    if not m:
        raise KeyError(f"mnv3: unmapped flax segment {segs}")
    base = f"blocks.{m.group(1)}.{m.group(2)}"
    sub = segs[1]
    if sub == "se_conv_reduce":
        return f"{base}.se.conv_reduce"
    if sub == "se_conv_expand":
        return f"{base}.se.conv_expand"
    return f"{base}.{sub}"  # conv_pw/bn1/conv_dw/bn2/conv_pwl/bn3


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def encoder_segments_to_torch(
    name: str, segs: List[str]
) -> Tuple[str, Optional[str]]:
    """(torch module path, special) for one flax module path of encoder
    `name`. `segs` excludes the leaf name and flax `bn` wrapper segments."""
    if name.startswith("tu-"):
        base = name[3:]
        name = base if not base.startswith("timm-") else base
        for candidate in (base, f"timm-{base}"):
            if candidate in _KNOWN_PREFIX_CACHE or _family(candidate):
                name = candidate
                break
    fam = _family(name)
    if fam == "resnet":
        from hallucidet_tpu.interop.torch_loader import _segments_to_torch

        return _segments_to_torch(segs), None
    if fam == "vgg":
        return _map_vgg(name, segs), None
    if fam == "mbv2":
        return _map_mbv2(segs), None
    if fam == "densenet":
        return _map_densenet(segs), None
    if fam == "effnet":
        return _map_effnet(segs), None
    if fam == "mit":
        return _map_mit(segs)
    if fam == "senet":
        return _map_senet(segs), None
    if fam == "xception":
        return _map_xception(segs), None
    if fam == "dpn":
        return _map_dpn(segs), None
    if fam == "inceptionv4":
        return _map_inceptionv4(segs), None
    if fam == "inceptionresnetv2":
        return _map_inceptionresnetv2(segs), None
    if fam == "timm_resnest":
        return _map_timm_resnet(True, segs), None
    if fam == "timm_resnet":
        return _map_timm_resnet(False, segs), None
    if fam == "regnet":
        return _map_regnet(segs), None
    if fam == "gernet":
        return _map_gernet(segs), None
    if fam == "mnv3":
        return _map_mnv3(segs), None
    raise KeyError(f"no torch key mapping for encoder family of `{name}`")


_KNOWN_PREFIX_CACHE: set = set()


def _family(name: str) -> Optional[str]:
    if name.startswith(("resnet", "resnext")):
        return "resnet"
    if name.startswith("vgg"):
        return "vgg"
    if name == "mobilenet_v2":
        return "mbv2"
    if name.startswith("densenet"):
        return "densenet"
    if name.startswith("efficientnet-"):
        return "effnet"
    if name.startswith("mit_"):
        return "mit"
    if name in _SENET_NAMES:
        return "senet"
    if name == "xception":
        return "xception"
    if name.startswith("dpn"):
        return "dpn"
    if name == "inceptionv4":
        return "inceptionv4"
    if name == "inceptionresnetv2":
        return "inceptionresnetv2"
    if name.startswith("timm-resnest"):
        return "timm_resnest"
    if name.startswith(("timm-res2", "timm-skres")):
        return "timm_resnet"
    if name.startswith("timm-regnet"):
        return "regnet"
    if name.startswith("timm-gernet"):
        return "gernet"
    if name.startswith("timm-mobilenetv3"):
        return "mnv3"
    return None


def has_family_mapping(name: str) -> bool:
    if name.startswith("tu-"):
        base = name[3:]
        return _family(base) is not None or _family(f"timm-{base}") is not None
    return _family(name) is not None
