"""Segmentation / classification heads, including the HalluciDet head variants.

Rebuild of smp heads (reference: src/segmentation_models/base/heads.py) plus
the head swaps done by the reference's EncoderDecoder wrapper (reference:
src/models/encoder_decoder.py:29-45): 'sigmoid' (the trained config),
'relu_bn', and 'avg_dropout_sigmoid'. The reference's relu_bn branch crashes
on a missing attribute upstream; here it is implemented as evidently intended
(ReLU then BatchNorm over the output channels).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hallucidet_tpu.nn.layers import BatchNorm, conv, make_activation
from hallucidet_tpu.ops.fused_upsample import depth_to_space, s2d_conv_kernel_f
from hallucidet_tpu.ops.image_ops import upsample_nearest


class SegmentationHead(nn.Module):
    """conv3x3 -> optional deterministic upsample -> head activation."""

    out_channels: int
    kernel_size: int = 3
    upsampling: int = 1
    head: str = "sigmoid"  # sigmoid | relu_bn | avg_dropout_sigmoid | identity | any activation name
    dropout: float = 0.2
    avg2d: bool = True
    # input is space-to-depth phase form [B,H/fh,W/fw,fh*fw*C] (UnetDecoder
    # s2d_tail with matching s2d_factors); the conv runs in phase form and
    # the result is depth-to-spaced back before the head activation. Exact.
    s2d_input: bool = False
    s2d_factors: tuple = (4, 2)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        keep_phase_form: bool = False,
    ) -> jnp.ndarray:
        if self.s2d_input:
            from hallucidet_tpu.nn.unet_decoder import ConvParams, _phase_conv

            assert self.kernel_size == 3 and self.upsampling == 1
            fh, fw = self.s2d_factors
            nph = fh * fw
            kernel, bias = ConvParams(
                (3, 3, x.shape[-1] // nph, self.out_channels), use_bias=True,
                name="0",
            )()
            kt = s2d_conv_kernel_f(kernel, fh, fw).astype(x.dtype)
            # pad output channels to a TPU-friendly width — XLA's conv is
            # pathologically slow for O≈12 lanes; dead channels are free by
            # comparison and sliced off before the depth-to-space.
            n = kt.shape[-1]
            n_pad = max(0, 64 - n)
            if n_pad:
                kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, n_pad)))
                # barrier: stop XLA from simplifying conv(x, pad(k))[..:n]
                # back to the pathologically slow O=12 conv
                kt = jax.lax.optimization_barrier(kt)
            y = _phase_conv(x, kt)[..., :n]
            y = y + jnp.tile(bias, nph)
            if keep_phase_form and self.head in (
                "sigmoid", "identity", None, "tanh",
            ):
                # elementwise activations commute with the phase
                # interleave: return [B,H/fh,W/fw,nph*out] for consumers
                # that can read phase form (ops/image_ops.py
                # resize_bilinear_from_phase)
                return make_activation(self.head)(y)
            x = depth_to_space(y, fh, fw)
        else:
            x = conv(
                self.out_channels, self.kernel_size, 1, self.kernel_size // 2,
                name="0",
            )(x)
            if self.upsampling > 1:
                x = upsample_nearest(x, self.upsampling)
        if self.head == "relu_bn":
            x = nn.relu(x)
            x = BatchNorm(self.out_channels, name="head_bn")(x, train)
        elif self.head == "avg_dropout_sigmoid":
            if self.avg2d:
                x = jnp.mean(x, axis=(1, 2), keepdims=True)
            if train and self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, deterministic=False)(
                    x, rng=dropout_rng
                )
            x = jax.nn.sigmoid(x)
        else:
            x = make_activation(self.head)(x)
        return x


class ClassificationHead(nn.Module):
    """global-avg-pool -> dropout -> linear [-> activation] (reference:
    src/segmentation_models/base/heads.py:29-38)."""

    classes: int
    dropout: float = 0.2
    activation: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        x = jnp.mean(x, axis=(1, 2))
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x, rng=dropout_rng)
        x = nn.Dense(self.classes, name="linear")(x)
        if self.activation:
            x = make_activation(self.activation)(x)
        return x
