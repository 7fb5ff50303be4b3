"""U-Net decoder with deterministic nearest upsampling, NHWC Flax.

Rebuild of the reference's vendored smp UnetDecoder — including its one
behavioral fork from upstream smp: all upsampling is the deterministic
pixel-repeat (reference: src/segmentation_models/decoders/unet/decoder.py:7-8)
— plus the skip-less `UnetModifiedDecoder` variant (reference:
src/segmentation_models/decoders/unetmodified/decoder.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from flax import linen as fnn

import jax

from hallucidet_tpu.nn.layers import Attention, BatchNorm, ConvBnReLU
from hallucidet_tpu.ops.fused_upsample import (
    fold_h,
    s2d_conv_kernel_f,
    s2d_skipfold_conv_kernel,
    unfold_h,
    up2_h1fold_conv_kernel,
    up2_h1fold_from_h1fold_conv_kernel,
    up_phase_conv_kernel,
    up_phase_h2_conv_kernel,
    up_phase_h2_from_h4fold_kernel,
    upsample2_concat_conv3x3,
)
from hallucidet_tpu.ops.image_ops import upsample_nearest


class _UpConcatConv(nn.Module):
    """Param-holder for the fused upsample+concat+conv3x3 (ops/fused_upsample).
    Parameter layout is identical to nn.Conv ('kernel'[3,3,Cin,O], 'bias'),
    so checkpoints are interchangeable with the unfused path."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x_coarse, skip):
        cin = x_coarse.shape[-1] + (0 if skip is None else skip.shape[-1])
        kernel = self.param(
            "kernel", fnn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = (
            self.param("bias", fnn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return upsample2_concat_conv3x3(x_coarse, skip, kernel, bias)


class FusedUpConvBnReLU(nn.Module):
    """Fused upsample+concat+conv -> BN -> ReLU with the same param tree as
    ConvBnReLU ('0' conv, '1' batchnorm)."""

    features: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x_coarse, skip, train: bool = False):
        x = _UpConcatConv(
            self.features, use_bias=not self.use_batchnorm, name="0"
        )(x_coarse, skip)
        if self.use_batchnorm:
            x = BatchNorm(self.features, name="1")(x, train)
        return nn.relu(x)


from hallucidet_tpu.nn.layers import ConvParams  # noqa: F401 (re-export)


def _fast_mode() -> bool:
    prec = jax.config.jax_default_matmul_precision
    return prec not in ("highest", "float32")


def _phase_conv(
    x, kernel, padding=((1, 1), (1, 1)), strides=(1, 1), lhs_dilation=(1, 1)
):
    """Conv used by the phase-form tail. The optimization barrier keeps XLA
    from mega-fusing it with the producer conv (measured 45 GF/ms fused vs
    ~2x better split); in fast mode (jax_default_matmul_precision not
    highest/float32) the conv computes in bf16 like every other matmul in
    fast mode — the output returns to the input dtype."""
    x = jax.lax.optimization_barrier(x)
    out_dtype = x.dtype
    if _fast_mode() and x.dtype == jnp.float32:
        x = x.astype(jnp.bfloat16)
        kernel = kernel.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        x, kernel, strides, padding, lhs_dilation=lhs_dilation,
        dimension_numbers=dn,
    )
    return out.astype(out_dtype)


class _S2DConvBnReLU(nn.Module):
    """ConvBnReLU computed in space-to-depth (phase) form. Param tree is
    identical to ConvBnReLU ('0' conv [3,3,Cin,O], '1' bn over O); the BN runs
    on a [..., nph, O] view so its stats/params stay per-O (full-res exact).

    The shipped tail uses factors (4, 2): a second H-only packing level on
    top of the 2x2 phase form. The extra H fold puts >=128 channels on the
    TPU's 128-wide lane dim — the thin tail convs were lane-starved at 4x
    packing (measured 66 -> 177 GF/ms for the [3,3,128,128]@H/4 form,
    PERF.md round 3)."""

    features: int
    in_channels: int
    use_batchnorm: bool = True
    # 's2d':      x is aligned phase form [B,H/fh,W/fw,fh*fw*Cin]
    # 'up':       x is coarse [B,h,w,Cin] -> (2,2) phase out (legacy tail)
    # 'up_h2':    x is coarse [B,h,w,Cin] -> (4,2) phase out via a strided
    #             4-tap conv (no input fold copy)
    # 'up_h2_f4': x is the producer's (4,1) H-FOLDED coarse output
    #             [B,h/4,w,4Cin] -> (4,2) phase out via an H-lhs-dilated conv
    #             (no unfold copy; HFoldMidBlock handoff)
    mode: str = "s2d"
    factors: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        o = self.features
        kernel, bias = ConvParams(
            (3, 3, self.in_channels, o), use_bias=not self.use_batchnorm,
            name="0",
        )()
        fh, fw = self.factors
        nph = fh * fw
        ld = (1, 1)
        if self.mode == "up":
            assert self.factors == (2, 2)
            kt, pad, strides = up_phase_conv_kernel(kernel), ((1, 1), (1, 1)), (1, 1)
        elif self.mode == "up_h2":
            assert self.factors == (4, 2)
            kt, pad, strides = up_phase_h2_conv_kernel(kernel), ((1, 1), (1, 1)), (2, 1)
        elif self.mode == "up_h2_f4":
            assert self.factors == (4, 2)
            kt, pad, strides = (
                up_phase_h2_from_h4fold_kernel(kernel), ((2, 2), (1, 1)), (1, 1),
            )
            ld = (2, 1)
        else:
            kt, pad, strides = s2d_conv_kernel_f(kernel, fh, fw), ((1, 1), (1, 1)), (1, 1)
        y = _phase_conv(x, kt.astype(x.dtype), pad, strides, lhs_dilation=ld)
        if bias is not None:
            y = y + jnp.tile(bias, nph)
        if self.use_batchnorm:
            b_, h_, w_, _ = y.shape
            y = BatchNorm(o, name="1")(y.reshape(b_, h_, w_, nph, o), train)
            y = y.reshape(b_, h_, w_, nph * o)
        return nn.relu(y)


# A phase-form SECOND-TO-LAST block (S2DMidBlock: conv1 = up_phase_conv(x)
# + s2d_conv(S2D(skip)), conv2 in phase or full form) was built, exact, and
# measured NEUTRAL on v5e (127.0-127.2 vs 127.7 img/s): the conv gains
# (block_3 conv1 4.2->2.0 ms) were eaten by the S2D(skip) + the phase->full
# D2S handoff copy (~2 ms in-context). Removed; post-mortem in PERF.md.


class _HFoldConvBnReLU(nn.Module):
    """ConvBnReLU computed on an H-only (fold, 1) space-to-depth view:
    fold_h -> packed conv (s2d_conv_kernel_f) -> BN/ReLU on the folded view
    -> unfold_h. Exact up to float reassociation; param tree identical to
    ConvBnReLU ('0' conv [3,3,Cin,O], '1' bn over O).

    Purpose: the decoder's thin stride-1 conv2s (32-64 channels at half/
    quarter resolution) run 10-20x off roofline because the channel (lane)
    dim is under 128. Folding H by f puts f*C on the lane dim: the
    [3,3,32,32]@[512,640] conv measured 31.6 -> 12.2 ms as
    [3,3,128,128]@[128,640] (PERF.md round 3 probe). The fold/unfold are
    reshape-transposes XLA fuses into the neighbor fusions' epilogues."""

    features: int
    in_channels: int
    fold: int
    use_batchnorm: bool = True
    fold_input: bool = True    # False: x is already (fold,1)-H-folded
    unfold_output: bool = True  # False: return the folded form

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        o = self.features
        kernel, bias = ConvParams(
            (3, 3, self.in_channels, o), use_bias=not self.use_batchnorm,
            name="0",
        )()
        f = self.fold
        kf = s2d_conv_kernel_f(kernel, f, 1)
        y = fold_h(x, f) if self.fold_input else x
        y = _phase_conv(y, kf.astype(y.dtype))
        if bias is not None:
            y = y + jnp.tile(bias, f)
        if self.use_batchnorm:
            b_, h_, w_, _ = y.shape
            y = BatchNorm(o, name="1")(y.reshape(b_, h_, w_, f, o), train)
            y = y.reshape(b_, h_, w_, f * o)
        y = nn.relu(y)
        return unfold_h(y, f) if self.unfold_output else y


class _HFoldUpConvBnReLU(nn.Module):
    """The fused upsample2+concat(skip)+conv3x3 (FusedUpConvBnReLU semantics)
    emitting its output DIRECTLY in (fold,1) H-folded form — the up half as a
    strided W-lhs-dilated conv on the coarse input (up2_h1fold_conv_kernel)
    and the skip half as a stride-fold conv on the full-res skip
    (s2d_skipfold_conv_kernel). No fold copy exists anywhere: both convs
    write the folded layout natively. Param tree identical to
    FusedUpConvBnReLU ('0' conv [3,3,Cu+Cs,O], '1' bn over O). Exact."""

    features: int
    fold: int
    use_batchnorm: bool = True
    input_fold: int = 1  # f//2: x_coarse is the producer's (f//2,1) fold
    # skip_fold == fold: the skip arrives ALREADY (fold,1)-H-folded (the
    # encoder's copy-free folded layer1, nn/resnet.py h_fold_layer1) and is
    # consumed with a plain folded-in/folded-out packed conv
    # (s2d_conv_kernel_f) instead of the stride-fold full-res consume.
    skip_fold: int = 1

    @nn.compact
    def __call__(self, x_coarse, skip, train: bool = False):
        o, f = self.features, self.fold
        cu = x_coarse.shape[-1] // self.input_fold
        cs = skip.shape[-1] // self.skip_fold
        cin = cu + cs
        kernel, bias = ConvParams(
            (3, 3, cin, o), use_bias=not self.use_batchnorm, name="0"
        )()
        if self.skip_fold > 1:
            assert self.skip_fold == f, "folded skip must match the block fold"
            kb = s2d_conv_kernel_f(kernel[:, :, cu:, :], f, 1)
            skip_strides = (1, 1)
        else:
            kb = s2d_skipfold_conv_kernel(kernel[:, :, cu:, :], f)
            skip_strides = (f, 1)
        if self.input_fold > 1:
            assert self.input_fold == f // 2
            ka = up2_h1fold_from_h1fold_conv_kernel(kernel[:, :, :cu, :], f)
            y = _phase_conv(
                x_coarse, ka.astype(x_coarse.dtype),
                padding=((1, 1), (2, 2)), strides=(1, 1),
                lhs_dilation=(1, 2),
            )
        else:
            ka = up2_h1fold_conv_kernel(kernel[:, :, :cu, :], f)
            y = _phase_conv(
                x_coarse, ka.astype(x_coarse.dtype),
                padding=((1, 1), (2, 2)), strides=(f // 2, 1),
                lhs_dilation=(1, 2),
            )
        y = y + _phase_conv(
            skip, kb.astype(skip.dtype),
            padding=((1, 1), (1, 1)), strides=skip_strides,
        )
        if bias is not None:
            y = y + jnp.tile(bias, f)
        if self.use_batchnorm:
            b_, h_, w_, _ = y.shape
            y = BatchNorm(o, name="1")(y.reshape(b_, h_, w_, f, o), train)
            y = y.reshape(b_, h_, w_, f * o)
        return nn.relu(y)


class HFoldMidBlock(nn.Module):
    """A skip-carrying DecoderBlock computed end-to-end in (fold,1) H-folded
    form: conv1 emits the folded layout natively (_HFoldUpConvBnReLU), conv2
    runs packed (s2d_conv_kernel_f(·, fold, 1)), and the output either
    unfolds (unfold_out=True) or stays folded for a fold-aware consumer
    (the S2DTailBlock's up_phase_h2_from_h4fold_kernel path). The fold puts
    fold*out_channels on the TPU's 128-wide lane dim — the thin half/quarter
    resolution decoder convs run 10-20x off roofline unfolded (PERF.md
    round 3). Param tree identical to DecoderBlock. Exact."""

    out_channels: int
    fold: int
    use_batchnorm: bool = True
    unfold_out: bool = True
    input_fold: int = 1  # fold//2: x is the producer's (fold//2,1) fold
    skip_fold: int = 1  # fold: skip arrives (fold,1)-H-folded

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        y = _HFoldUpConvBnReLU(
            self.out_channels, self.fold, self.use_batchnorm,
            input_fold=self.input_fold, skip_fold=self.skip_fold, name="conv1",
        )(x, skip, train)
        return _HFoldConvBnReLU(
            self.out_channels, self.out_channels, self.fold,
            use_batchnorm=self.use_batchnorm,
            fold_input=False, unfold_output=self.unfold_out, name="conv2",
        )(y, train)


class S2DTailBlock(nn.Module):
    """The final (skip-less, attention-free) DecoderBlock computed in phase
    form: the 2x nearest-upsample never materializes and the thin full-res
    convs become packed-channel convs at reduced resolution (exact up to
    float reassociation; see ops/fused_upsample.py transforms). Output stays
    in phase form [B, H/fh, W/fw, fh*fw*out_channels] for the (also
    phase-form) segmentation head. Param tree identical to DecoderBlock.

    factors (4, 2) — the shipped form — adds a second H-only packing level:
    conv1 consumes the coarse input with a strided 4-tap kernel (no fold
    copy) and every tail conv runs with >=128 channels on the lane dim."""

    out_channels: int
    use_batchnorm: bool = True
    factors: Tuple[int, int] = (4, 2)
    input_fold: int = 1  # 4: x_coarse is the producer's (4,1) H-folded form

    @nn.compact
    def __call__(self, x_coarse, train: bool = False):
        if self.input_fold == 4:
            assert self.factors == (4, 2)
            up_mode = "up_h2_f4"
            cin = x_coarse.shape[-1] // 4
        else:
            up_mode = "up_h2" if self.factors == (4, 2) else "up"
            cin = x_coarse.shape[-1]
        y = _S2DConvBnReLU(
            self.out_channels, cin, self.use_batchnorm,
            mode=up_mode, factors=self.factors, name="conv1",
        )(x_coarse, train)
        y = _S2DConvBnReLU(
            self.out_channels, self.out_channels, self.use_batchnorm,
            mode="s2d", factors=self.factors, name="conv2",
        )(y, train)
        return y


def _h_fold_factor(x_shape, out_channels: int) -> int:
    """Fold factor for a decoder conv2: fill the 128-wide lane dim
    (128 // C), but only when H divides evenly and the folded H keeps >= 8
    sublane rows. Returns 1 (no fold) when the conv is already lane-healthy."""
    if out_channels >= 128 or x_shape[-1] >= 128:
        return 1
    f = 128 // max(out_channels, x_shape[-1])
    h = x_shape[1]
    while f > 1 and (h % f != 0 or h // f < 8):
        f //= 2
    return f


class DecoderBlock(nn.Module):
    """upsample x2 -> [concat skip -> attention1] -> conv1 -> conv2 -> attention2
    (reference: src/segmentation_models/decoders/unet/decoder.py:11-46).

    With no attention (the HalluciDet config), the upsample+concat+conv1 runs
    as the exact fused phase-conv (ops/fused_upsample.py) — no full-resolution
    intermediates; same parameters, same output up to float reassociation.
    """

    out_channels: int
    skip_channels: int = 0
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    # conv1 as lhs-dilated up-conv + skip-conv (ops/fused_upsample.py): the
    # 2x-upsampled concat intermediate never materializes. Exact; the earlier
    # 4-phase+interleave formulation measured slower than XLA's own fusion,
    # but the transposed-conv form beats it (PERF.md round 3).
    fused: bool = True
    # conv2 on an H-folded view when out_channels < 128 (lane-starved).
    # Exact (_HFoldConvBnReLU); param tree unchanged. Default OFF: the
    # explicit fold/unfold copies measured ~43 ms/step of XLA layout
    # artifacts at batch 64 — the copy-free HFoldMidBlock (UnetDecoder
    # routing) is the shipped form; this flag remains for experiments.
    h_fold: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.fused and self.attention_type is None:
            x = FusedUpConvBnReLU(
                self.out_channels, use_batchnorm=self.use_batchnorm, name="conv1"
            )(x, skip, train)
        else:
            x = upsample_nearest(x, 2)
            if skip is not None:
                x = jnp.concatenate([x, skip], axis=-1)
                x = Attention(
                    self.attention_type, in_channels=x.shape[-1], name="attention1"
                )(x)
            x = ConvBnReLU(
                self.out_channels, use_batchnorm=self.use_batchnorm, name="conv1"
            )(x, train)
        f = _h_fold_factor(x.shape, self.out_channels) if self.h_fold else 1
        if f > 1:
            x = _HFoldConvBnReLU(
                self.out_channels, x.shape[-1], f,
                use_batchnorm=self.use_batchnorm, name="conv2",
            )(x, train)
        else:
            x = ConvBnReLU(
                self.out_channels, use_batchnorm=self.use_batchnorm, name="conv2"
            )(x, train)
        x = Attention(
            self.attention_type, in_channels=self.out_channels, name="attention2"
        )(x)
        return x


class CenterBlock(nn.Module):
    """Two ConvBnReLU, used only for VGG-style encoders (center=True)."""

    out_channels: int
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBnReLU(self.out_channels, use_batchnorm=self.use_batchnorm, name="0")(
            x, train
        )
        x = ConvBnReLU(self.out_channels, use_batchnorm=self.use_batchnorm, name="1")(
            x, train
        )
        return x


class UnetDecoder(nn.Module):
    """Takes the smp 6-feature encoder list; deepest feature is the head,
    shallower ones are skips, the final block upsamples skip-less to input
    resolution (reference: src/segmentation_models/decoders/unet/decoder.py:
    78-124)."""

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    center: bool = False
    use_skips: bool = True  # False => UnetModified (skip connections removed)
    fused: bool = True  # exact fused upsample+concat+conv (ops/fused_upsample)
    # route lane-starved skip blocks (out_ch < 128) through the copy-free
    # H-folded HFoldMidBlock; when the next block is the (4,2) tail, the
    # (4,1)-folded form is handed off without ever unfolding
    h_fold: bool = True
    remat: bool = False  # rematerialize blocks (see nn/resnet.py ResNet.remat)
    # compute the final block in space-to-depth phase form and return
    # [B, H/fh, W/fw, fh*fw*decoder_channels[-1]] — the segmentation head must
    # then run with s2d_input=True and the same factors
    # (translation/unet.py coordinates this)
    s2d_tail: bool = False
    s2d_factors: Tuple[int, int] = (4, 2)
    # per-skip (fold, 1) H-fold factors, aligned with the skips list
    # (deepest-first); a fold > 1 marks a skip the encoder emitted H-FOLDED
    # (nn/resnet.py h_fold_layer1). The matching HFoldMidBlock consumes it
    # natively; any non-matching path unfolds it first (correctness
    # fallback, costs one copy). None == all 1.
    skip_folds: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(
        self, features: List[jnp.ndarray], train: bool = False
    ) -> jnp.ndarray:
        feats = features[1:][::-1]  # drop input image, deepest first
        head, skips = feats[0], feats[1:]
        x = head
        if self.center:
            x = CenterBlock(
                head.shape[-1], use_batchnorm=self.use_batchnorm, name="center"
            )(x, train)
        block_cls = (
            nn.remat(DecoderBlock, static_argnums=(3,))
            if self.remat
            else DecoderBlock
        )
        last = len(self.decoder_channels) - 1
        x_fold = 1  # current H-fold factor of x (HFoldMidBlock handoff)
        def skip_fold_of(j: int) -> int:
            if self.skip_folds is None or j >= len(self.skip_folds):
                return 1
            return self.skip_folds[j]

        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if (self.use_skips and i < len(skips)) else None
            sf = skip_fold_of(i) if skip is not None else 1
            if (
                self.s2d_tail
                and i == last
                and skip is None
                and self.attention_type is None
            ):
                tail_cls = (
                    nn.remat(S2DTailBlock, static_argnums=(2,))
                    if self.remat
                    else S2DTailBlock
                )
                return tail_cls(
                    out_channels=out_ch,
                    use_batchnorm=self.use_batchnorm,
                    factors=self.s2d_factors,
                    input_fold=x_fold,
                    name=f"block_{i}",
                )(x, train)
            h_nat, w_nat = x.shape[1] * x_fold, x.shape[2]
            f = self._mid_fold(h_nat, w_nat, skip, out_ch, sf)
            if f > 1:
                if sf > 1 and sf != f:
                    skip = unfold_h(skip, sf)  # fallback: mismatched fold
                    sf = 1
                # keep the fold through the handoff when the NEXT consumer
                # reads it natively: the (4,2) S2DTailBlock takes a (4,1)
                # fold; a following HFoldMidBlock with fold 2f takes an
                # (f,1) fold (up2_h1fold_from_h1fold_conv_kernel).
                next_skip = (
                    skips[i + 1] if (self.use_skips and i + 1 < len(skips)) else None
                )
                if i == last - 1 and self.s2d_tail and next_skip is None:
                    keep = f == 4 and self.s2d_factors == (4, 2)
                elif i < last:
                    f_next = self._mid_fold(
                        2 * h_nat, 2 * w_nat, next_skip,
                        self.decoder_channels[i + 1],
                        skip_fold_of(i + 1) if next_skip is not None else 1,
                    )
                    keep = f_next == 2 * f and f_next == 4
                else:
                    keep = False
                mid_cls = (
                    nn.remat(HFoldMidBlock, static_argnums=(3,))
                    if self.remat
                    else HFoldMidBlock
                )
                x = mid_cls(
                    out_channels=out_ch,
                    fold=f,
                    use_batchnorm=self.use_batchnorm,
                    unfold_out=not keep,
                    input_fold=x_fold,
                    skip_fold=sf,
                    name=f"block_{i}",
                )(x, skip, train)
                x_fold = f if keep else 1
                continue
            assert x_fold == 1
            if sf > 1:
                skip = unfold_h(skip, sf)  # plain block: unfold (one copy)
            x = block_cls(
                out_channels=out_ch,
                skip_channels=0 if skip is None else skip.shape[-1],
                use_batchnorm=self.use_batchnorm,
                attention_type=self.attention_type,
                fused=self.fused,
                name=f"block_{i}",
            )(x, skip, train)
        return x

    def _mid_fold(
        self, h_nat: int, w_nat: int, skip, out_ch: int, skip_fold: int = 1
    ) -> int:
        """Fold factor for a skip-carrying decoder block with native input
        size (h_nat, w_nat): fill the 128-wide lane dim (128 // out_ch in
        {2, 4}) when shapes divide evenly; 1 (no fold) otherwise or when the
        block is already lane-healthy. `skip_fold` is the (fold,1) H-fold the
        skip ALREADY carries (encoder folded layer1) — the shape check
        compares its native height."""
        if (
            not self.h_fold
            or not self.fused
            or self.attention_type is not None
            or skip is None
            or out_ch >= 128
        ):
            return 1
        f = 128 // out_ch
        if f not in (2, 4):
            return 1
        h_out = 2 * h_nat
        if (
            skip.shape[1] * skip_fold != h_out
            or skip.shape[2] != 2 * w_nat
            or h_out % f != 0
            or h_out // f < 8
        ):
            return 1
        return f
