#!/usr/bin/env python
"""One-command GPU/torch-host validation checklist (VERDICT r3 next #8).

Everything this zero-egress TPU environment cannot verify, in one
invocation on any host with torch(+torchvision), the published checkpoints,
and optionally `pycocotools` / `lpips`:

    python scripts/host_checklist.py \
        --llvip <LLVIP_ROOT> \
        --hallucidet-ckpt hallucidet_llvip_seed123.ckpt \
        --detector-ckpt fasterrcnn_rgb_llvip_seed123.ckpt \
        [--lpips-net alex] [--out checklist.json]

Checks (each reported PASS/FAIL/SKIP independently; exit 0 iff none FAIL):
  1. ap50_parity      — the AP@50 69.75/76.86/90.57 gate
                        (scripts/parity_llvip.py; reference README.md:134-137)
  2. map_conformance  — metrics/mean_ap.py vs pycocotools COCOeval on random
                        synthetic detections (pins the tie-break choice at
                        metrics/mean_ap.py:137-139); falls back to
                        torchmetrics' MeanAveragePrecision if pycocotools is
                        absent; SKIP if neither importable.
  3. lpips_conversion — scripts/convert_lpips.py on the real `lpips` package
                        weights + forward comparison vs the torch LPIPS on a
                        random image pair; SKIP if `lpips` not importable.
  4. encoder_zoo      — scripts/convert_encoder.py against REAL upstream
                        weights, one representative per encoder family
                        (reference: src/segmentation_models/encoders/
                        __init__.py:62-85 pretrained settings), then a
                        deepest-feature forward diff vs the torch model.
                        Sources: torchvision / pretrainedmodels /
                        efficientnet_pytorch / timm — names whose source
                        package is absent are SKIPped individually.

In-env plumbing smoke (no torch host needed; wired into the suite via
tests/test_parity_smoke.py):

    python scripts/host_checklist.py --smoke
"""

import argparse
import json
import sys

import numpy as np


def _result(name, status, detail=""):
    print(f"[{status:4s}] {name}" + (f" — {detail}" if detail else ""))
    return {"check": name, "status": status, "detail": detail}


# ---------------------------------------------------------------------------
# 1. AP@50 parity gate
# ---------------------------------------------------------------------------


def check_ap50(args):
    import importlib

    parity = importlib.import_module("parity_llvip")
    if args.smoke:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            rc = parity.run_smoke(td)
        return _result("ap50_parity", "PASS" if rc == 0 else "FAIL",
                       "smoke: synthetic weights, golden assert skipped")
    rc = parity.main([
        "--llvip", args.llvip,
        "--hallucidet-ckpt", args.hallucidet_ckpt,
        "--detector-ckpt", args.detector_ckpt,
        "--batch", str(args.batch),
    ])
    return _result("ap50_parity", "PASS" if rc == 0 else "FAIL",
                   "golden 69.75/76.86/90.57 ±0.3")


# ---------------------------------------------------------------------------
# 2. mAP cross-library conformance
# ---------------------------------------------------------------------------


def _synthetic_detections(rng, n_images=24, max_gt=6, max_det=12, classes=3):
    """Random boxes with controlled overlap so matching paths all fire."""
    preds, targets = [], []
    for _ in range(n_images):
        ng = rng.integers(1, max_gt + 1)
        gt = np.stack([
            rng.uniform(0, 200, ng), rng.uniform(0, 200, ng),
            rng.uniform(20, 120, ng), rng.uniform(20, 120, ng),
        ], 1).astype(np.float32)
        gt[:, 2:] += gt[:, :2]
        gl = rng.integers(1, classes + 1, ng)
        nd = rng.integers(0, max_det + 1)
        # half the detections jitter a gt box (true-positive-ish), half random
        db, dl = [], []
        for j in range(nd):
            if j % 2 == 0 and ng:
                k = rng.integers(0, ng)
                b = gt[k] + rng.normal(0, 8, 4).astype(np.float32)
                lab = gl[k] if rng.random() < 0.8 else rng.integers(1, classes + 1)
            else:
                b = np.array([*rng.uniform(0, 200, 2), 0, 0], np.float32)
                b[2:] = b[:2] + rng.uniform(10, 120, 2)
                lab = rng.integers(1, classes + 1)
            db.append(np.maximum(b, 0))
            dl.append(lab)
        preds.append({
            "boxes": np.array(db, np.float32).reshape(nd, 4),
            "scores": rng.uniform(0.05, 1.0, nd).astype(np.float32),
            "labels": np.array(dl, np.int64).reshape(nd),
        })
        targets.append({"boxes": gt, "labels": gl.astype(np.int64)})
    return preds, targets


def check_map_conformance(args):
    from hallucidet_tpu.metrics.mean_ap import MeanAveragePrecision

    rng = np.random.default_rng(0)
    preds, targets = _synthetic_detections(rng)

    ours = MeanAveragePrecision()
    for p, t in zip(preds, targets):
        ours.update([p], [t])
    got = ours.compute()

    if args.smoke:
        # in-env: neither pycocotools nor torchmetrics installable; just pin
        # that the synthetic fixture exercises the full surface
        keys = ("map", "map_50", "map_75", "map_small", "mar_100")
        ok = all(-1.0 <= got[k] <= 1.0 for k in keys) and got["map_50"] > 0
        return _result("map_conformance", "PASS" if ok else "FAIL",
                       "smoke: surface + range check only "
                       f"(map_50={got['map_50']:.4f})")

    try:
        from torchmetrics.detection import MeanAveragePrecision as TMAP
        import torch

        ref = TMAP()
        ref.update(
            [{k: torch.as_tensor(v) for k, v in p.items()} for p in preds],
            [{k: torch.as_tensor(v) for k, v in t.items()} for t in targets],
        )
        want = {k: float(v) for k, v in ref.compute().items()
                if k in got and np.ndim(v) == 0}
    except ImportError:
        try:
            want = _cocoeval_reference(preds, targets)
        except ImportError:
            return _result("map_conformance", "SKIP",
                           "neither torchmetrics nor pycocotools importable")
    bad = {k: (got[k], want[k]) for k in want
           if abs(got[k] - want[k]) > 1e-3}
    return _result(
        "map_conformance", "FAIL" if bad else "PASS",
        f"compared {len(want)} metrics" + (f"; mismatches: {bad}" if bad else ""),
    )


def _cocoeval_reference(preds, targets):
    """pycocotools COCOeval on the same synthetic set -> torchmetrics-named
    subset (map, map_50, map_75, map_small/medium/large, mar_1/10/100)."""
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    images, anns, dets, aid = [], [], [], 1
    cats = sorted({int(l) for t in targets for l in t["labels"]})
    for i, (p, t) in enumerate(zip(preds, targets)):
        images.append({"id": i, "width": 400, "height": 400})
        for b, l in zip(t["boxes"], t["labels"]):
            anns.append({
                "id": aid, "image_id": i, "category_id": int(l),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "area": float((b[2] - b[0]) * (b[3] - b[1])),
                "iscrowd": 0,
            })
            aid += 1
        for b, s, l in zip(p["boxes"], p["scores"], p["labels"]):
            dets.append({
                "image_id": i, "category_id": int(l), "score": float(s),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
            })
    gt = COCO()
    gt.dataset = {"images": images, "annotations": anns,
                  "categories": [{"id": c} for c in cats]}
    gt.createIndex()
    ev = COCOeval(gt, gt.loadRes(dets), "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    s = ev.stats
    return {"map": s[0], "map_50": s[1], "map_75": s[2], "map_small": s[3],
            "map_medium": s[4], "map_large": s[5], "mar_1": s[6],
            "mar_10": s[7], "mar_100": s[8]}


# ---------------------------------------------------------------------------
# 3. LPIPS conversion + forward conformance
# ---------------------------------------------------------------------------


def check_lpips(args):
    import importlib
    import os
    import tempfile

    conv = importlib.import_module("convert_lpips")
    if args.smoke:
        # plumbing only: tests/test_lpips.py already round-trips the npz
        # schema on synthetic weights; here just verify import surfaces
        ok = hasattr(conv, "convert_state_dict")
        return _result("lpips_conversion", "PASS" if ok else "FAIL",
                       "smoke: converter import surface")
    try:
        import lpips as lpips_pkg
        import torch
    except ImportError:
        return _result("lpips_conversion", "SKIP", "`lpips` not importable")

    net = args.lpips_net
    model = lpips_pkg.LPIPS(net=net)
    npz = conv.convert_state_dict(model.state_dict())
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, f"lpips_{net}.npz")
        np.savez(path, **npz)

        from hallucidet_tpu.losses.lpips import LPIPS, load_lpips_npz

        flax_model = LPIPS(net=net)
        variables = load_lpips_npz(path)
        rng = np.random.default_rng(1)
        a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = model(
                torch.from_numpy(a.transpose(0, 3, 1, 2)),
                torch.from_numpy(b.transpose(0, 3, 1, 2)),
            ).numpy().reshape(-1)
        got = np.asarray(flax_model.apply(variables, a, b)).reshape(-1)
    ok = np.allclose(got, want, rtol=1e-3, atol=1e-4)
    return _result("lpips_conversion", "PASS" if ok else "FAIL",
                   f"forward diff {np.abs(got - want).max():.2e}")


# ---------------------------------------------------------------------------
# 4. encoder zoo: real-weight conversion + forward diff per family
# ---------------------------------------------------------------------------

# One representative per encoder family -> (source, torch builder spec).
# The torch side produces the model's deepest pre-pooling feature map; the
# flax side is the converted encoder's last staged feature. Both are compared
# NHWC at f32 tolerance. Names whose source package isn't importable SKIP.
_ZOO_REPS = {
    # torchvision
    "resnet18": ("torchvision", "resnet18", "layer4"),
    "densenet121": ("torchvision", "densenet121", "features"),
    "mobilenet_v2": ("torchvision", "mobilenet_v2", "features"),
    "vgg11": ("torchvision", "vgg11", "features"),
    # pretrainedmodels (cadene)
    "dpn68": ("pretrainedmodels", "dpn68", "features"),
    "inceptionv4": ("pretrainedmodels", "inceptionv4", "features"),
    "inceptionresnetv2": ("pretrainedmodels", "inceptionresnetv2", None),
    "se_resnet50": ("pretrainedmodels", "se_resnet50", "layer4"),
    "senet154": ("pretrainedmodels", "senet154", "layer4"),
    "xception": ("pretrainedmodels", "xception", None),
    # efficientnet_pytorch
    "efficientnet-b0": ("efficientnet_pytorch", "efficientnet-b0", None),
    # timm
    "timm-gernet_s": ("timm", "gernet_s", None),
    "timm-mobilenetv3_small_100": ("timm", "mobilenetv3_small_100", None),
    "timm-regnetx_002": ("timm", "regnetx_002", None),
    "timm-regnety_002": ("timm", "regnety_002", None),
    "timm-res2net50_26w_4s": ("timm", "res2net50_26w_4s", None),
    "timm-resnest14d": ("timm", "resnest14d", None),
    "timm-skresnet18": ("timm", "skresnet18", None),
    # mit (SegFormer): upstream weights live in the SegFormer release, not a
    # pip package — convert manually with scripts/convert_encoder.py
}

# the in-env smoke exercises the script chain end-to-end on synthesized
# weights for a small cross-source subset (key-map totality over all 104
# names is tests/test_interop_zoo.py's job)
_ZOO_SMOKE = ("mobilenet_v2", "resnet18", "timm-regnetx_002")


def _torch_deep_feature(source, spec, hook_point, x_nchw):
    """Build the pretrained torch model and return (state_dict, deepest
    feature ndarray NCHW)."""
    import torch

    if source == "torchvision":
        import torchvision.models as tvm

        model = getattr(tvm, spec)(weights="IMAGENET1K_V1").eval()
    elif source == "pretrainedmodels":
        import pretrainedmodels

        model = pretrainedmodels.__dict__[spec](
            num_classes=1000, pretrained="imagenet"
        ).eval()
    elif source == "efficientnet_pytorch":
        from efficientnet_pytorch import EfficientNet

        model = EfficientNet.from_pretrained(spec).eval()
        with torch.no_grad():
            return model.state_dict(), model.extract_features(x_nchw).numpy()
    else:  # timm
        import timm

        model = timm.create_model(spec, pretrained=True).eval()
        feat = timm.create_model(
            spec, pretrained=True, features_only=True
        ).eval()
        with torch.no_grad():
            return model.state_dict(), feat(x_nchw)[-1].numpy()

    with torch.no_grad():
        if hook_point is None:
            out = model.features(x_nchw)  # cadene models expose .features()
        else:
            mod = dict(model.named_modules())[hook_point]
            captured = {}
            h = mod.register_forward_hook(
                lambda m, i, o: captured.setdefault("out", o)
            )
            model(x_nchw)
            h.remove()
            out = captured["out"]
    return model.state_dict(), out.numpy()


def _convert_and_forward(name, sd, tmpdir):
    """torch state dict -> .pth -> convert_encoder.py -> npz -> flax encoder
    forward; returns the deepest staged feature [1, h, w, c]."""
    import importlib
    import os

    import jax
    import jax.numpy as jnp
    import torch

    conv = importlib.import_module("convert_encoder")
    from hallucidet_tpu.interop.torch_loader import load_encoder_npz
    from hallucidet_tpu.nn.encoders import get_encoder

    pth = os.path.join(tmpdir, "enc.pth")
    torch.save({k: (v if isinstance(v, torch.Tensor) else torch.as_tensor(v))
                for k, v in sd.items()}, pth)
    npz = os.path.join(tmpdir, "enc.npz")
    assert conv.convert(name, pth, npz) == 0
    enc, _, _ = get_encoder(name)
    variables = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), False
    )
    loaded = load_encoder_npz(npz)  # full converted variables (all colls)
    variables = {coll: loaded.get(coll, tree)
                 for coll, tree in variables.items()}
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    stages = enc.apply(variables, jnp.asarray(x), False)
    return x, np.asarray(stages[-1])


def check_encoder_zoo(args):
    import tempfile

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    if args.smoke:
        # script-chain smoke on synthesized weights (no upstream packages):
        # synthesize -> .pth -> convert_encoder.convert -> npz -> bit-equal
        import jax.numpy as jnp
        import torch

        from hallucidet_tpu.interop import torch_loader as tl
        from hallucidet_tpu.nn.encoders import get_encoder

        for name in _ZOO_SMOKE:
            enc, _, _ = get_encoder(name)
            src = enc.init(
                jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3), jnp.float32),
                False,
            )
            sd = tl.synthesize_torch_state_dict(
                dict(src), encoder_name=name, encoder_root=None
            )
            sd = {k: torch.from_numpy(np.asarray(v).copy())
                  for k, v in sd.items()}
            with tempfile.TemporaryDirectory() as td:
                _, feat = _convert_and_forward(name, sd, td)
            if not np.all(np.isfinite(feat)):
                return _result("encoder_zoo", "FAIL",
                               f"smoke: non-finite forward for {name}")
        return _result("encoder_zoo", "PASS",
                       f"smoke: convert chain OK for {', '.join(_ZOO_SMOKE)}")

    import torch

    results, failures, skips = [], [], []
    for name, (source, spec, hook) in sorted(_ZOO_REPS.items()):
        x_nchw = torch.from_numpy(
            np.random.default_rng(5).uniform(0, 1, (1, 3, 64, 64))
            .astype(np.float32)
        )
        try:
            sd, want = _torch_deep_feature(source, spec, hook, x_nchw)
        except ImportError:
            skips.append(f"{name} ({source} absent)")
            continue
        try:
            with tempfile.TemporaryDirectory() as td:
                _, got = _convert_and_forward(name, sd, td)
            want_nhwc = want.transpose(0, 2, 3, 1)
            if got.shape != want_nhwc.shape:
                raise AssertionError(
                    f"shape {got.shape} vs {want_nhwc.shape}"
                )
            diff = np.abs(got - want_nhwc).max()
            rel = diff / max(np.abs(want_nhwc).max(), 1e-6)
            if rel > 1e-2:
                raise AssertionError(f"forward rel diff {rel:.2e}")
            results.append(f"{name} OK (rel {rel:.1e})")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    if failures:
        return _result("encoder_zoo", "FAIL", "; ".join(failures))
    if not results:
        return _result("encoder_zoo", "SKIP",
                       "no source packages importable: " + "; ".join(skips))
    detail = f"{len(results)} families verified"
    if skips:
        detail += f"; skipped: {', '.join(skips)}"
    return _result("encoder_zoo", "PASS", detail)


# ---------------------------------------------------------------------------


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--llvip")
    ap.add_argument("--hallucidet-ckpt")
    ap.add_argument("--detector-ckpt")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lpips-net", default="alex")
    ap.add_argument("--out", default=None, help="write results JSON")
    ap.add_argument("--smoke", action="store_true",
                    help="in-env plumbing smoke (no torch host required)")
    args = ap.parse_args(argv)

    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if not args.smoke and not (args.llvip and args.hallucidet_ckpt
                               and args.detector_ckpt):
        print("need --llvip/--hallucidet-ckpt/--detector-ckpt (or --smoke)",
              file=sys.stderr)
        return 2

    results = []
    for fn in (check_ap50, check_map_conformance, check_lpips,
               check_encoder_zoo):
        try:
            results.append(fn(args))
        except Exception as e:  # noqa: BLE001 — a crash is a FAIL, not an abort
            results.append(_result(fn.__name__, "FAIL",
                                   f"{type(e).__name__}: {e}"))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    failed = [r["check"] for r in results if r["status"] == "FAIL"]
    print(json.dumps({"failed": failed,
                      "passed": [r["check"] for r in results
                                 if r["status"] == "PASS"],
                      "skipped": [r["check"] for r in results
                                  if r["status"] == "SKIP"]}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
