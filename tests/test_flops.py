"""Pin the analytic SOL FLOP model (utils/flops.py) so bench.py's
vs_baseline denominator cannot drift silently.

Cross-checks: resnet34 at 224x224 must reproduce the published 7.2 GFLOP
(3.6 GMACs, He et al. table 1) within the stem/downsample rounding, and the
decoder entries must match hand-derived values for the known geometry.
"""

import numpy as np

from hallucidet_tpu.utils.flops import (
    detector_fasterrcnn_entries,
    product_step_gflops_per_image,
    stage_gflops,
    unet_resnet34_entries,
)


def test_resnet34_matches_published_gflops():
    enc = sum(f for n, f in unet_resnet34_entries((224, 224))
              if n.startswith("enc."))
    # published: 3.6 GMACs = 7.2 GFLOP (conv-only accounting excludes the
    # fc head we don't have; tolerance covers it + rounding conventions)
    assert 6.8e9 < enc < 7.5e9, enc / 1e9


def test_decoder_block_hand_values():
    entries = dict(unet_resnet34_entries((1024, 1280)))
    # block_0 @64x80: conv1 3x3 (512+256)->256 + conv2 3x3 256->256
    want = 2 * 9 * 768 * 256 * 64 * 80 + 2 * 9 * 256 * 256 * 64 * 80
    np.testing.assert_allclose(entries["dec.block_0 @64x80"], want)
    # seg head 3x3 16->3 at native res
    np.testing.assert_allclose(
        entries["dec.seg_head 3x3 16->3"], 2 * 9 * 16 * 3 * 1024 * 1280
    )


def test_detector_roi_heads_dominated_by_fc6():
    entries = dict(detector_fasterrcnn_entries(300, 512))
    roi = entries["det.roi_heads (512 RoIs)"]
    fc6 = 2 * 512 * 256 * 7 * 7 * 1024
    assert fc6 / roi > 0.85  # fc6 is the dominant term


def test_totals_pinned():
    # golden totals for the benched geometry; a deliberate model change must
    # update these AND the PERF.md SOL table
    s = stage_gflops((1024, 1280))
    np.testing.assert_allclose(s["encoder"], 191.4, atol=0.1)
    np.testing.assert_allclose(s["decoder"], 121.9, atol=0.1)
    np.testing.assert_allclose(s["detector"], 48.0, atol=0.1)
    np.testing.assert_allclose(
        product_step_gflops_per_image((1024, 1280)), s["total"]
    )
