"""Analytic conv/matmul FLOP accounting for the product pipeline (VERDICT r3
next #7: make bench.py's speed-of-light denominator auditable).

Counts the CANONICAL model's required work — 2*K*K*Cin*Cout multiply-adds per
output pixel for convs, 2*M*N*K for matmuls — independent of implementation
tricks (the gray-fold stem computes LESS than this, the structured-zero phase
folds compute MORE; the denominator is what the MODEL needs, so implementation
wins/losses show up in the utilization number, not the target).

Every entry is (name, flops) so `python tools/sol_accounting.py` can print
the per-stage table; bench.py consumes the totals. Elementwise/BN/pool work
is excluded by design (bandwidth-bound, not MXU): this is a CONV-FLOP
speed-of-light, the same convention PERF.md has used since round 1.

Geometry sources: U-Net resnet34 (nn/encoders.py RESNET_CFG, nn/unet_decoder
.py decoder_channels (256,128,64,32,16)); detector torchvision-style
fasterrcnn_resnet50_fpn re-headed to 2 classes at a fixed 300x300 transform
(detection/detector.py:52-76), 512 sampled RoIs on the parity path
(FasterRCNNConfig.box_batch_size_per_image) and `serving_post_nms_top_n`=512
on the serving path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


def _conv(h: int, w: int, k: int, cin: int, cout: int) -> float:
    """FLOPs of a kxk conv producing an h x w x cout map (2 = mul+add)."""
    return 2.0 * h * w * k * k * cin * cout


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# U-Net resnet34 translation net
# ---------------------------------------------------------------------------

_RESNET34_LAYERS = ((3, 64), (4, 128), (6, 256), (3, 512))  # (blocks, ch)
_DECODER_CHANNELS = (256, 128, 64, 32, 16)


def unet_resnet34_entries(hw: Tuple[int, int]) -> List[Tuple[str, float]]:
    H, W = hw
    out: List[Tuple[str, float]] = []
    # stem: 7x7 s2, canonical 3-channel input (the gray-fold stem computes
    # 1/3 of this — an implementation win, counted as utilization)
    out.append(("enc.stem 7x7 3->64 /2", _conv(H // 2, W // 2, 7, 3, 64)))
    h, w, cin = H // 4, W // 4, 64  # after stride-2 maxpool
    for li, (blocks, ch) in enumerate(_RESNET34_LAYERS, start=1):
        if li > 1:
            h, w = h // 2, w // 2
        f = 0.0
        for b in range(blocks):
            f += _conv(h, w, 3, cin if b == 0 else ch, ch)  # conv1
            f += _conv(h, w, 3, ch, ch)  # conv2
            if b == 0 and cin != ch:
                f += _conv(h, w, 1, cin, ch)  # downsample
        out.append((f"enc.layer{li} x{blocks} @{h}x{w}", f))
        cin = ch
    # decoder: block i consumes up2(prev) concat skip -> conv1 3x3, conv2 3x3
    skips = (256, 128, 64, 64, 0)  # encoder channels met on the way up
    prev = 512
    h, w = H // 32, W // 32
    for i, (ch, skip) in enumerate(zip(_DECODER_CHANNELS, skips)):
        h, w = h * 2, w * 2
        f = _conv(h, w, 3, prev + skip, ch) + _conv(h, w, 3, ch, ch)
        out.append((f"dec.block_{i} @{h}x{w}", f))
        prev = ch
    out.append(("dec.seg_head 3x3 16->3", _conv(H, W, 3, _DECODER_CHANNELS[-1], 3)))
    return out


# ---------------------------------------------------------------------------
# Faster R-CNN resnet50-FPN detector @ 300x300 (2 classes)
# ---------------------------------------------------------------------------

_RESNET50_LAYERS = ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))


def detector_fasterrcnn_entries(size: int = 300, num_rois: int = 512,
                                num_classes: int = 2) -> List[Tuple[str, float]]:
    out: List[Tuple[str, float]] = []
    H = W = size
    out.append(("det.stem 7x7 3->64 /2", _conv(H // 2, W // 2, 7, 3, 64)))
    h = w = _ceil_div(size, 4)
    cin = 64
    level_hw = []
    for li, (blocks, mid, cout) in enumerate(_RESNET50_LAYERS, start=1):
        if li > 1:
            h, w = _ceil_div(h, 2), _ceil_div(w, 2)
        f = 0.0
        for b in range(blocks):
            f += _conv(h, w, 1, cin if b == 0 else cout, mid)
            f += _conv(h, w, 3, mid, mid)
            f += _conv(h, w, 1, mid, cout)
            if b == 0:
                f += _conv(h, w, 1, cin, cout)  # downsample
        out.append((f"det.layer{li} x{blocks} @{h}x{w}", f))
        level_hw.append((h, w))
        cin = cout
    # FPN: 1x1 laterals + 3x3 output convs on C2..C5 (P6 is a pooled level)
    fpn = 0.0
    for (h, w), c in zip(level_hw, (256, 512, 1024, 2048)):
        fpn += _conv(h, w, 1, c, 256) + _conv(h, w, 3, 256, 256)
    out.append(("det.fpn laterals+outputs", fpn))
    # RPN head: shared 3x3 + 1x1 cls/bbox over all 5 levels
    rpn_hw = level_hw + [(_ceil_div(level_hw[-1][0], 2),
                          _ceil_div(level_hw[-1][1], 2))]
    rpn = 0.0
    for h, w in rpn_hw:
        rpn += _conv(h, w, 3, 256, 256)
        rpn += _conv(h, w, 1, 256, 3) + _conv(h, w, 1, 256, 12)
    out.append(("det.rpn head (5 levels)", rpn))
    # RoI heads on `num_rois` 7x7x256 pools: bilinear pool (4 taps/output) +
    # fc6/fc7/predictors
    pool = 2.0 * num_rois * 7 * 7 * 4 * 256
    fc6 = 2.0 * num_rois * (256 * 7 * 7) * 1024
    fc7 = 2.0 * num_rois * 1024 * 1024
    pred = 2.0 * num_rois * 1024 * (num_classes + num_classes * 4)
    out.append((f"det.roi_heads ({num_rois} RoIs)", pool + fc6 + fc7 + pred))
    return out


# ---------------------------------------------------------------------------
# totals
# ---------------------------------------------------------------------------

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip


def stage_gflops(hw: Tuple[int, int] = (1024, 1280), det_size: int = 300,
                 num_rois: int = 512) -> Dict[str, float]:
    """Per-image GFLOP by stage (the SOL decomposition PERF.md publishes)."""
    unet = unet_resnet34_entries(hw)
    det = detector_fasterrcnn_entries(det_size, num_rois)
    enc = sum(f for n, f in unet if n.startswith("enc.")) / 1e9
    dec = sum(f for n, f in unet if n.startswith("dec.")) / 1e9
    return {
        "encoder": enc,
        "decoder": dec,
        "detector": sum(f for _, f in det) / 1e9,
        "total": enc + dec + sum(f for _, f in det) / 1e9,
    }


def product_step_gflops_per_image(hw: Tuple[int, int] = (1024, 1280)) -> float:
    """bench.py's SOL denominator: canonical conv/matmul GFLOP per image
    through the product eval step (U-Net @ native res + detector @ 300)."""
    return stage_gflops(hw)["total"]
