"""Reconstruction loss selection (pixel + perceptual).

Rebuild of the reference glue (reference: src/losses/losses.py:5-48): pixel
mse/l1; perceptual psnr/ssim/msssim implemented natively in XLA; LPIPS
(lpips_{alexnet,vgg,squeeze}, config.py:163) implemented natively in Flax
(losses/lpips.py) — pretrained towers load from a converted checkpoint via
HALLUCIDET_LPIPS_WEIGHTS, otherwise a fixed-seed random-feature tower serves
as the documented zero-egress fallback. Default training uses detector loss
only (all reconstruction weights 0), matching the reference.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from hallucidet_tpu.ops.losses import (
    l1_pixel_loss,
    mse_pixel_loss,
    psnr,
    ssim,
    ssim_loss,
)


def msssim_loss(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0):
    """Multi-scale SSIM loss (5 scales, standard weights), NHWC."""
    weights = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    vals = []
    x, y = pred, target
    for i, w in enumerate(weights):
        vals.append(w * ssim(x, y, max_val))
        if i < len(weights) - 1:
            x = (x[:, ::2, ::2, :] + x[:, 1::2, 1::2, :]) * 0.5
            y = (y[:, ::2, ::2, :] + y[:, 1::2, 1::2, :]) * 0.5
    return 1.0 - jnp.sum(jnp.asarray(vals))


class Reconstruction:
    """select_loss_pixel / select_loss_perceptual, mirroring the reference
    surface (src/losses/losses.py)."""

    @staticmethod
    def select_loss_pixel(name: Optional[str]) -> Optional[Callable]:
        if name is None:
            return None
        table = {"mse": mse_pixel_loss, "l1": l1_pixel_loss}
        if name not in table:
            raise ValueError(f"unknown pixel loss {name}")
        return table[name]

    @staticmethod
    def select_loss_perceptual(name: Optional[str]) -> Optional[Callable]:
        if name is None:
            return None
        table = {
            "psnr": lambda a, b: -psnr(a, b),  # maximize psnr => minimize -psnr
            "ssim": ssim_loss,
            "msssim": msssim_loss,
        }
        if name in table:
            return table[name]
        if name.startswith("lpips"):
            from hallucidet_tpu.losses.lpips import lpips_loss

            # reference names: lpips_alexnet / lpips_vgg / lpips_squeeze
            # (config.py:163); lpips package nets: alex / vgg / squeeze
            net = name.split("_", 1)[1] if "_" in name else "alex"
            net = {"alexnet": "alex", "alex": "alex", "vgg": "vgg",
                   "squeeze": "squeeze"}.get(net)
            if net is None:
                raise ValueError(f"unknown lpips variant {name}")
            return lpips_loss(net)
        raise ValueError(f"unknown perceptual loss {name}")
