#!/usr/bin/env python
"""The AP@50 = 90.57 parity gate as a runnable artifact (BASELINE.md;
reference README.md:134-137, eval_hallucidet.py:180-213).

Converts the published seed-123 torch checkpoints, evaluates the LLVIP test
split through the product pipeline, and ASSERTS the three golden AP@50
numbers. On a host without the real checkpoints (e.g. this zero-egress TPU
environment) run `--smoke`: the full convert->eval->mAP chain executes on
synthetic weights + fixture data and only the golden assertion is skipped.

    # real gate (host with LLVIP + the HF checkpoints):
    python scripts/parity_llvip.py \
        --llvip <LLVIP_ROOT> \
        --hallucidet-ckpt hallucidet_llvip_seed123.ckpt \
        --detector-ckpt fasterrcnn_rgb_llvip_seed123.ckpt

    # in-env smoke (synthetic fixtures, converter exercised on synthetic
    # torch state dicts, golden numbers not asserted):
    python scripts/parity_llvip.py --smoke

Golden numbers (reference README.md:134-137): IR 69.75 / RGB 76.86 /
Hall 90.57, asserted to +-0.3 AP for accumulation-order differences.
Parity mode pins jax_default_matmul_precision=highest.
"""

import argparse
import os
import sys

GOLDEN = {"map_ir": 69.75, "map_rgb": 76.86, "map_hall": 90.57}
TOL = 0.3


def evaluate(llvip_root, hallucidet_ckpt, detector_ckpt, batch=8, seed=123,
             decoder_backbone="resnet34"):
    """convert -> eval -> {map_ir, map_rgb, map_hall} in AP@50 percent."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    from hallucidet_tpu.data import MultiModalDataModule
    from hallucidet_tpu.train import (
        HalluciDetModule, HalluciDetTrainConfig, Trainer,
    )

    np.random.seed(seed)
    detector_variables = None
    if detector_ckpt:
        from hallucidet_tpu.interop import load_detector_variables

        detector_variables = load_detector_variables(
            detector_ckpt, "fasterrcnn", 2
        )
    module = HalluciDetModule(
        HalluciDetTrainConfig(
            detector="fasterrcnn", decoder_backbone=decoder_backbone,
            n_classes=2, input_size=300,
        ),
        rng=jax.random.PRNGKey(seed),
        detector_variables=detector_variables,
    )
    if hallucidet_ckpt:
        from hallucidet_tpu.interop import load_encoder_decoder_variables

        module.ed_variables = load_encoder_decoder_variables(
            hallucidet_ckpt, encoder_name=decoder_backbone, classes=3,
            head="sigmoid",
        )

    dm = MultiModalDataModule(
        dataset="llvip",
        path_images_train_rgb=llvip_root,
        path_images_train_ir=llvip_root,
        path_images_test_rgb=llvip_root,
        path_images_test_ir=llvip_root,
        batch_size=batch, num_workers=0, ext=".jpg", seed=seed,
        split_ratio_train_valid=0.8, ablation_flag=False, max_boxes=32,
    )
    results = Trainer(max_epochs=0, seed=seed).test_hallucidet(module, dm)
    return {k: results[k]["map_50"] * 100 for k in ("map_ir", "map_rgb", "map_hall")}


def run_smoke(tmpdir):
    """Exercise the full converter->eval->mAP chain with synthetic torch
    checkpoints and fixture data; golden numbers are NOT asserted."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import data_fixtures

    root = data_fixtures.make_llvip(os.path.join(tmpdir, "llvip"))
    # synthetic torch checkpoints through the REAL converter entry points:
    # random-init flax variables -> torch-layout state dict (the exact
    # inverse mapping) -> .bin -> load_*_variables
    import jax
    import torch

    from hallucidet_tpu.detection import Detector
    from hallucidet_tpu.interop.torch_loader import synthesize_torch_state_dict
    from hallucidet_tpu.translation import create_model
    import jax.numpy as jnp

    det = Detector(name="fasterrcnn", n_classes=2, size=300)
    det_sd = synthesize_torch_state_dict(
        det.init(jax.random.PRNGKey(0)), detector="fasterrcnn"
    )
    det_path = os.path.join(tmpdir, "det.bin")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in det_sd.items()}, det_path)

    unet = create_model("unet", encoder_name="resnet34", classes=3)
    ed_vars = unet.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 96, 128, 3), jnp.float32), False
    )
    ed_sd = synthesize_torch_state_dict(dict(ed_vars))
    ed_path = os.path.join(tmpdir, "ed.bin")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in ed_sd.items()}, ed_path)

    res = evaluate(root, ed_path, det_path, batch=2, decoder_backbone="resnet34")
    for k, v in res.items():
        assert 0.0 <= v <= 100.0, (k, v)
    print("smoke OK (synthetic weights; golden assertion skipped):", res)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--llvip", help="LLVIP root (visible/ infrared/ Annotations/)")
    ap.add_argument("--hallucidet-ckpt")
    ap.add_argument("--detector-ckpt")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic end-to-end smoke; skips golden assert")
    args = ap.parse_args(argv)

    if args.smoke:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            return run_smoke(td)

    if not (args.llvip and args.hallucidet_ckpt and args.detector_ckpt):
        print("need --llvip, --hallucidet-ckpt, --detector-ckpt (or --smoke)",
              file=sys.stderr)
        return 2
    res = evaluate(args.llvip, args.hallucidet_ckpt, args.detector_ckpt,
                   batch=args.batch)
    print(f"AP@50 IR  : {res['map_ir']:.2f}  (golden {GOLDEN['map_ir']})")
    print(f"AP@50 RGB : {res['map_rgb']:.2f}  (golden {GOLDEN['map_rgb']})")
    print(f"AP@50 Hall: {res['map_hall']:.2f}  (golden {GOLDEN['map_hall']})")
    failures = [
        k for k in GOLDEN if abs(res[k] - GOLDEN[k]) > TOL
    ]
    if failures:
        print(f"PARITY FAIL: {failures}", file=sys.stderr)
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
