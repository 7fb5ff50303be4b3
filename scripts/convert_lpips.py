#!/usr/bin/env python
"""Offline LPIPS weight converter: lpips-package state dict -> the npz
`hallucidet_tpu.losses.lpips.load_lpips_npz` consumes.

The reference wires pretrained LPIPS towers + calibration heads from the
`lpips` package (reference: src/losses/losses.py:6-24). This build is
zero-egress, so the conversion runs OFFLINE on any host that has torch and
either (a) the `lpips` package or (b) a saved `LPIPS(...).state_dict()` .pth:

    # on a host with lpips installed:
    python scripts/convert_lpips.py --net alex --out lpips_alex.npz
    # or from a saved state dict:
    python scripts/convert_lpips.py --state-dict lpips_alex.pth --out lpips_alex.npz

then point the training env at it:

    export HALLUCIDET_LPIPS_WEIGHTS=/path/lpips_alex.npz

npz schema (frozen; tests/test_lpips.py round-trips it):
  keys are flax param paths joined with '/', values already HWIO:
    net/features_<torch_idx>[/<fire_sub>]/kernel  [H,W,I,O]
    net/features_<torch_idx>[/<fire_sub>]/bias    [O]
    lin<i>/kernel                                 [1,1,C,1]

Name mapping: the lpips tower wrappers register torchvision feature modules
under their ORIGINAL integer indices (pretrained_networks.py uses
add_module(str(original_index), ...)), so `net.sliceK.<idx>.*` maps directly
to this repo's `net/features_<idx>` naming. The calibration heads live at
`lin<i>.model.1.weight` (model.0 is dropout) with shape [1,C,1,1].
"""

import argparse
import sys

import numpy as np

# lpips ScalingLayer constants, asserted against the state dict when present
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO (interop.torch_loader.conv_kernel semantics)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_state_dict(sd) -> dict:
    """lpips.LPIPS state dict -> {npz_key: np.ndarray}."""
    out = {}
    for key, t in sd.items():
        w = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        parts = key.split(".")
        if parts[0] == "scaling_layer":
            ref = _SHIFT if parts[1] == "shift" else _SCALE
            got = w.reshape(-1)
            if not np.allclose(got, ref, atol=1e-6):
                raise ValueError(f"unexpected scaling constants {key}: {got}")
            continue
        if parts[0] == "net":
            # net.slice<K>.<torch_idx>[.<fire_sub>].weight|bias
            idx = parts[2]
            sub = parts[3:-1]  # [] for plain convs, ['squeeze'] etc for Fire
            leaf = parts[-1]
            path = "/".join(["net", f"features_{idx}", *sub])
            if leaf == "weight":
                out[f"{path}/kernel"] = conv_kernel(w)
            elif leaf == "bias":
                out[f"{path}/bias"] = w
            else:
                raise ValueError(f"unexpected tower leaf: {key}")
            continue
        if parts[0].startswith("lin") and parts[-1] == "weight":
            # lin<i>.model.1.weight [1, C, 1, 1] -> [1, 1, C, 1]
            i = parts[0][3:]
            out[f"lin{i}/kernel"] = conv_kernel(w)
            continue
        raise ValueError(f"unrecognized lpips key: {key}")
    if not any(k.startswith("lin0/") for k in out):
        raise ValueError("no lin0 calibration head found — wrong checkpoint?")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="alex", choices=("alex", "vgg", "squeeze"))
    ap.add_argument(
        "--state-dict", default=None,
        help="path to a saved lpips.LPIPS(...).state_dict() .pth; when "
        "omitted the lpips package is imported and downloads its weights",
    )
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import torch

    if args.state_dict:
        sd = torch.load(args.state_dict, map_location="cpu")
    else:
        try:
            import lpips
        except ImportError:
            print(
                "the lpips package is not installed; pass --state-dict instead",
                file=sys.stderr,
            )
            return 2
        sd = lpips.LPIPS(net=args.net).state_dict()

    arrays = convert_state_dict(sd)
    np.savez(args.out, **arrays)
    print(f"wrote {args.out}: {len(arrays)} arrays")
    return 0


if __name__ == "__main__":
    sys.exit(main())
