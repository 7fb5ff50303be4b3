"""Fused nearest-upsample(2x) + concat(skip) + conv3x3 — exact algebraic
rewrite for the U-Net decoder hot path.

The naive decoder block (reference semantics:
src/segmentation_models/decoders/unet/decoder.py:38-46) materializes the 2x
nearest-upsampled tensor and its concat with the skip at full resolution —
two large HBM intermediates — then convolves with thin channels (poor MXU
lane utilization). Because convolution is linear in input channels and the
upsample is a phase-structured copy, the same output decomposes exactly as:

  conv3x3(concat(up2(x), skip), W) ==
      interleave_phases(conv2x2_phase(x, W_up)) + conv3x3(skip, W_skip)

where W_up / W_skip are channel-slices of the original kernel and each output
phase (py, px) in {0,1}^2 reads at most a 2x2 window of coarse pixels, with
taps that land on the same coarse pixel pre-summed. This removes both
intermediates and cuts the upsample-path MACs by 2.25x, with bit-identical
math up to float reassociation. Weights remain stored in the unfused layout,
so checkpoints and the torch converter are unaffected.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _conv(x: jnp.ndarray, k: jnp.ndarray, padding, lhs_dilation=(1, 1)) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, lhs_dilation=lhs_dilation, dimension_numbers=dn
    )


def up2_conv_kernel4(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [4,4,C,O]: conv3x3(nearest_up2(x)) as ONE lhs-dilated
    (transposed) conv — conv(x, k4, lhs_dilation=(2,2), padding=((2,2),(2,2))).

    Each output pixel reads a 2x2 coarse window; taps of the native 3x3
    kernel that land on the same coarse pixel are pre-summed. With the input
    dilated by 2 (zeros at odd positions), even/odd output rows pick the
    (k0, k1+k2) / (k0+k1, k2) row pairs out of the 4-tap kernel
    automatically — no phase interleave, no materialized upsample.
    Bit-exact vs conv3x3(up2(x)) (probe: 0.0 max diff at block_3 shapes,
    PERF.md round 3)."""
    rows = jnp.stack([k[0], k[0] + k[1], k[1] + k[2], k[2]], axis=0)  # [4,3,C,O]
    return jnp.stack(
        [rows[:, 0], rows[:, 0] + rows[:, 1], rows[:, 1] + rows[:, 2], rows[:, 2]],
        axis=1,
    )  # [4,4,C,O]


def upsample2_concat_conv3x3(
    x_coarse: jnp.ndarray,  # [B, h, w, Cu]
    skip: Optional[jnp.ndarray],  # [B, 2h, 2w, Cs] or None
    kernel: jnp.ndarray,  # [3, 3, Cu + Cs, O], unfused layout
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """== conv3x3(concat([up2(x_coarse), skip]), kernel) with SAME padding.

    The up half runs as a single lhs-dilated conv on the coarse tensor
    (up2_conv_kernel4 — the 2x-upsampled intermediate never materializes,
    2.25x fewer effective MACs); the skip half is a plain conv3x3; the two
    output contributions sum (channel-split of the concat conv — exact up to
    float reassociation)."""
    cu = x_coarse.shape[-1]
    k4 = up2_conv_kernel4(kernel[:, :, :cu, :]).astype(x_coarse.dtype)
    out = _conv(x_coarse, k4, ((2, 2), (2, 2)), lhs_dilation=(2, 2))
    if skip is not None:
        k_skip = kernel[:, :, cu:, :].astype(skip.dtype)
        out = out + _conv(skip, k_skip, ((1, 1), (1, 1)))
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# Space-to-depth (phase-form) conv transforms — the decoder-tail fast path.
#
# XLA's thin-channel convs at full resolution (16ch @ 1024x1280) run ~10-20x
# off their roofline in-context (bad intermediate layouts, C on the lane
# dim). Keeping the tail in 2x2 space-to-depth form turns them into
# 4x-channel convs at half resolution — same FLOPs, healthy MXU shapes —
# with the kernels transformed once per call (tiny [3,3,C,O] einsums).
# All transforms are exact up to float reassociation.
# ---------------------------------------------------------------------------


def phase_factors(phase_form) -> tuple:
    """(fh, fw) of a phase-form flag: `True` means the legacy 2x2 form;
    an (fh, fw) tuple passes through. Used by every phase-form consumer so
    bool call sites keep working while the shipped tail uses (4, 2)."""
    if phase_form is True:
        return (2, 2)
    fh, fw = phase_form
    return (int(fh), int(fw))


def phase_native_hw(images: jnp.ndarray, phase_form) -> tuple:
    """Native (H, W) of a phase-form tensor [B, H/fh, W/fw, fh*fw*C]."""
    fh, fw = phase_factors(phase_form)
    return (fh * images.shape[1], fw * images.shape[2])


def space_to_depth(x: jnp.ndarray, fh: int = 2, fw: int = 2) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/fh,W/fw,fh*fw*C], channel order (ry, rx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // fh, fh, w // fw, fw, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // fh, w // fw, fh * fw * c
    )


def depth_to_space(x: jnp.ndarray, fh: int = 2, fw: int = 2) -> jnp.ndarray:
    """[B,h,w,fh*fw*C] (channel order (py, px, c)) -> [B,fh*h,fw*w,C]."""
    b, h, w, cf = x.shape
    c = cf // (fh * fw)
    x = x.reshape(b, h, w, fh, fw, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, fh * h, fw * w, c)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel order (ry, rx, c)."""
    return space_to_depth(x, 2, 2)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """[B,h,w,4C] (channel order (py, px, c)) -> [B,2h,2w,C]."""
    return depth_to_space(x, 2, 2)


def s2d_conv_kernel_f(k: jnp.ndarray, fh: int = 2, fw: int = 2) -> jnp.ndarray:
    """[3,3,C,O] -> [3,3,fh*fw*C,fh*fw*O]:
    conv3x3(x) == D2S(conv3x3'(S2D(x, fh, fw)), fh, fw) for any factors >= 2.

    W'[Dy,Dx,(ry,rx,c),(py,px,o)] = k[dy,dx,c,o] with
    dy = fh*(Dy-1)+ry-py+1 when in 0..2 (else 0), dx with fw likewise.
    The packed kernel stays 3x3 for any factor (|ry-py| <= fh-1 keeps the
    native 3-tap window inside one packed-pixel neighborhood), and packed
    zero-padding reproduces native zero-padding exactly (the only boundary
    taps with nonzero weight map to native row/col -1 and H/W)."""
    import numpy as np

    c, o = k.shape[2], k.shape[3]

    def offsets(f):
        D = np.arange(3)[:, None, None]       # packed tap
        r = np.arange(f)[None, :, None]       # input phase
        p = np.arange(f)[None, None, :]       # output phase
        d = f * (D - 1) + r - p + 1           # native tap, [3,f,f]
        return np.clip(d, 0, 2), (d >= 0) & (d <= 2)

    dy, vy = offsets(fh)
    dx, vx = offsets(fw)
    shape = (3, fh, fh, 3, fw, fw)
    g = k[jnp.asarray(np.broadcast_to(dy[:, :, :, None, None, None], shape)),
          jnp.asarray(np.broadcast_to(dx[None, None, None, :, :, :], shape))]
    m = vy[:, :, :, None, None, None] & vx[None, None, None]
    g = g * jnp.asarray(m[..., None, None], k.dtype)
    # [Dy, ry, py, Dx, rx, px, C, O] -> [Dy, Dx, ry, rx, C, py, px, O]
    g = jnp.transpose(g, (0, 3, 1, 4, 6, 2, 5, 7))
    return g.reshape(3, 3, fh * fw * c, fh * fw * o)


def s2d_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [3,3,4C,4O]: conv3x3(x) == D2S(conv3x3'(S2D(x)))."""
    return s2d_conv_kernel_f(k, 2, 2)


def up2_h1fold_conv_kernel(k: jnp.ndarray, f: int) -> jnp.ndarray:
    """[3,3,C,O] -> [f//2+2, 4, C, f*O]: conv3x3(nearest_up2(x)) emitted
    DIRECTLY in (f,1) H-folded form from the coarse input — one conv with
    strides (f//2, 1), lhs_dilation (1, 2), padding ((1, 1), (2, 2)).

    Folded output row i packs full-res rows f*i+py (py in 0..f-1); the
    full-res conv's H-taps k[dy] land on coarse rows 2i*(f//2) + (py+dy-1)//2,
    giving f//2+2 strided taps; the W side is the standard up2 4-tap
    lhs-dilated combine (up2_conv_kernel4 cols). Output channel order (py, o)
    matches fold_h / s2d_conv_kernel_f(·, f, 1). Exact."""
    c, o = k.shape[2], k.shape[3]
    n_t = f // 2 + 2
    # cols4[tx][dy] : the up2 W-combine per original H-tap dy
    cols4 = [k[:, 0], k[:, 0] + k[:, 1], k[:, 1] + k[:, 2], k[:, 2]]  # [3,C,O]
    taps = []
    for T in range(n_t):
        phases = []
        for py in range(f):
            acc = None
            for dy in range(3):
                if (py + dy - 1) // 2 == T - 1:
                    w = jnp.stack([cols4[tx][dy] for tx in range(4)], axis=0)
                    acc = w if acc is None else acc + w
            phases.append(
                acc if acc is not None else jnp.zeros((4, c, o), k.dtype)
            )
        t = jnp.stack(phases, axis=0)  # [f, 4, C, O]
        taps.append(jnp.transpose(t, (1, 2, 0, 3)).reshape(4, c, f * o))
    return jnp.stack(taps, axis=0)  # [n_t, 4, C, f*O]


def up2_h1fold_from_h1fold_conv_kernel(k: jnp.ndarray, f: int) -> jnp.ndarray:
    """[3,3,C,O] -> [3, 4, (f//2)*C, f*O]: the up half of an (f,1)-H-folded
    decoder conv1 consuming the PRODUCER'S (f//2,1)-H-folded coarse output
    directly — strides (1,1), lhs_dilation (1,2), padding ((1,1),(2,2)).

    Full-res output row f*i+py reads coarse rows 2i+s with s=(py+dy-1)//2;
    coarse row 2i+s sits at folded-coarse (i + s//2, phase s%2), giving a
    3-tap stride-1 kernel over the folded coarse rows. Input channel order
    (q, c); output (py, o). Exact. Implemented for f=4 (the 64->32 channel
    chain of the resnet-family decoder)."""
    assert f == 4, "derived for the (2,1)->(4,1) fold chain"
    c, o = k.shape[2], k.shape[3]
    cols4 = [k[:, 0], k[:, 0] + k[:, 1], k[:, 1] + k[:, 2], k[:, 2]]
    f_in = f // 2
    taps = []
    for T in range(3):
        qs = []
        for q in range(f_in):
            phases = []
            for py in range(f):
                acc = None
                for dy in range(3):
                    s = (py + dy - 1) // 2
                    if (s // 2, s % 2) == (T - 1, q):
                        w = jnp.stack([cols4[tx][dy] for tx in range(4)], axis=0)
                        acc = w if acc is None else acc + w
                phases.append(
                    acc if acc is not None else jnp.zeros((4, c, o), k.dtype)
                )
            qs.append(jnp.stack(phases, axis=0))  # [f, 4, C, O]
        t = jnp.stack(qs, axis=0)  # [q, py, Tx, C, O]
        t = jnp.transpose(t, (2, 0, 3, 1, 4))  # [Tx, q, C, py, O]
        taps.append(t.reshape(4, f_in * c, f * o))
    return jnp.stack(taps, axis=0)  # [3, 4, f_in*C, f*O]


def s2d_skipfold_conv_kernel(ks: jnp.ndarray, f: int) -> jnp.ndarray:
    """[3,3,Cs,O] -> [f+2, 3, Cs, f*O]: conv3x3(skip) emitted in (f,1)
    H-folded form from the FULL-resolution skip — one conv with
    strides (f, 1), padding ((1, 1), (1, 1)).

    Folded output row i packs full rows f*i+py; tap T reads full row
    f*i-1+T, carrying ks[T-py] for each phase py with 0 <= T-py <= 2.
    Output channel order (py, o). Exact."""
    c, o = ks.shape[2], ks.shape[3]
    taps = []
    for T in range(f + 2):
        phases = []
        for py in range(f):
            dy = T - py
            phases.append(
                ks[dy] if 0 <= dy <= 2 else jnp.zeros((3, c, o), ks.dtype)
            )
        t = jnp.stack(phases, axis=0)  # [f, 3, C, O]
        taps.append(jnp.transpose(t, (1, 2, 0, 3)).reshape(3, c, f * o))
    return jnp.stack(taps, axis=0)  # [f+2, 3, C, f*O]


def up_phase_h2_from_h4fold_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [4,3,4C,8O]: the H2-tail conv1 (up_phase_h2_conv_kernel
    semantics) consuming its producer's (4,1) H-FOLDED output directly —
    lhs_dilation (2, 1), strides (1, 1), padding ((2, 2), (1, 1)).

    With the folded input row m sitting at dilated position 2m, even output
    rows I=2m' activate taps T in {0,2} (folded rows m'-1, m') and odd rows
    T in {1,3} (m', m'+1); inactive taps read inserted zeros. Input channel
    order (q, c) where q is the producer's fold phase. Exact."""
    kh = up_phase_h2_conv_kernel(k)  # [4,3,C,8O], taps over coarse 2I+t-1
    c, o8 = kh.shape[2], kh.shape[3]
    z = jnp.zeros((3, c, o8), k.dtype)
    rows = [
        jnp.stack([z, z, z, kh[0]], axis=1),          # T=0: row m'-1 (even I)
        jnp.stack([z, kh[0], kh[1], kh[2]], axis=1),  # T=1: row m' (odd I)
        jnp.stack([kh[1], kh[2], kh[3], z], axis=1),  # T=2: row m' (even I)
        jnp.stack([kh[3], z, z, z], axis=1),          # T=3: row m'+1 (odd I)
    ]
    out = jnp.stack(rows, axis=0)  # [T=4, dx=3, q=4, C, 8O]
    return out.reshape(4, 3, 4 * c, o8)


@jax.custom_vjp
def max_pool3x3s2_fold2(x: jnp.ndarray) -> jnp.ndarray:
    """fold_h(max_pool 3x3/s2/p1 (x), 2) emitted NATIVELY — no fold copy.

    Folded output row q packs pool rows (2q, 2q+1); pool row r covers input
    rows 2r-1..2r+1, so phase p covers input rows 4q+2p-1..4q+2p+1 — two
    stride-(4,2) reduce_windows (phase 0 over the 1-padded tensor, phase 1
    over x[1:]) whose channel concat IS the (2,1) fold layout (phase-major,
    matching fold_h / s2d_conv_kernel_f). Requires H % 4 == 0. Exact
    (tests/test_h_fold.py). Entry point of the copy-free folded-layer1 chain
    (nn/resnet.py h_fold_layer1; PERF.md round 4: the naive fold_h entry
    copy cost ~3.4 ms/step at batch 64 and erased the folded blocks' win).

    custom_vjp: differentiating the two phase reduce_windows directly costs
    TWO near-full-input select-and-scatters (measured 2x2.68 ms at b8 vs the
    single pool's 2.62). The phase windows are exactly the single pool's
    windows partitioned by row parity, so the backward is the STANDARD
    single maxpool backward applied to the unfolded cotangent (unfold_h is
    a reshape XLA fuses into the neighbors)."""
    b, h, w, c = x.shape
    assert h % 4 == 0, "folded maxpool needs H % 4 == 0"
    assert jnp.issubdtype(x.dtype, jnp.floating), "float activations only"
    dims, strides = (1, 3, 3, 1), (1, 4, 2, 1)
    # literal -inf init keeps JAX on the reduce_window_max monoid primitive
    # (differentiable); a traced init value falls back to the generic
    # reduce_window, which has no reverse-mode rule
    p0 = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides,
        padding=((0, 0), (1, 0), (1, 1), (0, 0)),
    )
    p1 = jax.lax.reduce_window(
        x[:, 1:], -jnp.inf, jax.lax.max, dims, strides,
        padding=((0, 0), (0, 0), (1, 1), (0, 0)),
    )
    return jnp.concatenate([p0, p1], axis=-1)


def _max_pool_fold2_fwd(x):
    return max_pool3x3s2_fold2(x), x


def _max_pool_fold2_bwd(x, g):
    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    # the recomputed forward inside vjp is dead code (the transpose rule of
    # reduce_window_max reads only x and the cotangent) — XLA eliminates it
    _, vjp = jax.vjp(pool, x)
    (dx,) = vjp(unfold_h(g, 2))
    return (dx,)


max_pool3x3s2_fold2.defvjp(_max_pool_fold2_fwd, _max_pool_fold2_bwd)


def fold2_stride2_consume_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [2,3,2C,O]: a stride-(2,·) 3x3 conv consuming the
    producer's (2,1) H-FOLDED output directly — strides (1, sx), padding
    ((1, 0), same W).

    Output row r' reads original rows 2r'-1, 2r', 2r'+1 = folded
    (r'-1, phase1), (r', phase0), (r', phase1): tap T0 carries k[0] on the
    phase-1 channels, tap T1 carries k[1]/k[2] on phase 0/1. Input channel
    order (p, c) matches fold_h. Exact. Used by FoldConsumeBasicBlock
    (layer2_0 consuming the folded layer1)."""
    c = k.shape[2]
    z = jnp.zeros_like(k[0])  # [3, C, O]
    t0 = jnp.concatenate([z, k[0]], axis=1)  # [3, 2C, O]
    t1 = jnp.concatenate([k[1], k[2]], axis=1)
    return jnp.stack([t0, t1], axis=0)  # [2, 3, 2C, O]


def fold2_stride2_consume_1x1_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[1,1,C,O] -> [1,1,2C,O]: a stride-2 1x1 conv (ResNet downsample)
    consuming a (2,1) H-folded input — strides (1, 2), padding 0. Output row
    r' reads original row 2r' = folded (r', phase0); the phase-1 block is
    zero. Exact."""
    return jnp.concatenate([k, jnp.zeros_like(k)], axis=2)


def fold_h(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/f,W,f*C], channel order (ry, c) — the (f, 1)
    space-to-depth fold consumed by s2d_conv_kernel_f(k, f, 1). A pure
    reshape-transpose; XLA typically fuses it into the producer's epilogue."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h // f, w, f * c)


def unfold_h(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of fold_h: [B,h,W,f*C] -> [B,f*h,W,C]."""
    b, h, w, fc = x.shape
    c = fc // f
    x = x.reshape(b, h, w, f, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, f * h, w, c)


def up_phase_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [3,3,C,4O]: conv3x3(up2(x)) == D2S(conv3x3'(x)).

    Taps of the full-res conv that land on the same coarse pixel are
    pre-summed (same math as _phase_kernel, laid out as one 3x3 conv):
    W'[Dy,Dx,c,(py,px,o)] = sum over dy with (py+dy-1)//2 == Dy-1,
    dx with (px+dx-1)//2 == Dx-1 of k[dy,dx,c,o]."""
    c, o = k.shape[2], k.shape[3]
    rows = []
    for Dy in range(3):
        cols = []
        for Dx in range(3):
            phases = []
            for py in range(2):
                for px in range(2):
                    acc = jnp.zeros((c, o), k.dtype)
                    for dy in range(3):
                        if (py + dy - 1) // 2 != Dy - 1:
                            continue
                        for dx in range(3):
                            if (px + dx - 1) // 2 != Dx - 1:
                                continue
                            acc = acc + k[dy, dx]
                    phases.append(acc)
            cols.append(jnp.concatenate(phases, axis=-1))  # [c, 4o]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [3,3,c,4o]


def up_phase_h2_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,O] -> [4,3,C,8O]: conv3x3(up2(x)) in H2 phase form, strided.

    conv3x3(up2_nearest(x)) == D2S(conv'(x, strides=(2,1), pad=((1,1),(1,1))),
    fh=4, fw=2) where x is the native coarse input [B,H,W,C] and the output
    [B,H/2,W,8O] is the (4,2) phase form of the 2H x 2W result. Output packed
    row I holds coarse rows 2I..2I+1 (hy) x native phases (py, px); the
    H-taps are the up-phase pre-summed weights shifted by hy, giving a 4-tap
    stride-2 kernel — the H2 tail consumes the producer's native output with
    no fold copy. Channel order (hy, py, px, o) == ascending native y-phase
    2*hy+py, matching s2d_conv_kernel_f's (4, 2) layout."""
    c, o = k.shape[2], k.shape[3]
    w3 = up_phase_conv_kernel(k)  # [3, 3, C, (py, px, o) = 4O]
    rows = []
    for t in range(4):
        # t = hy + Dy with hy in {0,1}, Dy in {0,1,2}
        parts = []
        for hy in range(2):
            dyi = t - hy
            if 0 <= dyi <= 2:
                parts.append(w3[dyi])  # [3, C, 4O]
            else:
                parts.append(jnp.zeros((3, c, 4 * o), k.dtype))
        rows.append(jnp.stack(parts, axis=2))  # [3, C, hy=2, 4O]
    out = jnp.stack(rows, axis=0)  # [4, 3, C, 2, 4O]
    return out.reshape(4, 3, c, 8 * o)


def s2d_stride2_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[K,K,C,O] (odd K, stride-2 'same' conv) -> [(K+1)/2+1, ., 4C, O]:
    conv_s2(x) == conv_s1(S2D(x), k') with padding (K//2+1)//2 each... —
    computed for the ResNet stem case K=7: out[i,j] reads rows 2i+dy-3,
    dy in 0..6; in S2D coords row = i + delta with delta = (dy-3-ry)/2,
    ry = (dy+1)%2, giving a 4-tap kernel with padding (2,1)."""
    import numpy as np

    kk, _, c, o = k.shape
    assert kk == 7, "stem transform implemented for 7x7 stride-2"
    out = np.zeros((4, 4, 2, 2, 1, 1), np.float32)  # occupancy map only
    pieces = {}
    for dy in range(7):
        ry = (dy + 1) % 2
        dlt = (dy - 3 - ry) // 2 + 2  # 0..3
        pieces[(dlt, ry)] = dy
    rows = []
    for Dy in range(4):
        cols = []
        for Dx in range(4):
            chan = []
            for ry in range(2):
                for rx in range(2):
                    dy = pieces.get((Dy, ry))
                    dx = pieces.get((Dx, rx))
                    if dy is None or dx is None:
                        chan.append(jnp.zeros((c, o), k.dtype))
                    else:
                        chan.append(k[dy, dx])
            cols.append(jnp.concatenate(chan, axis=0))  # [4c, o]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [4,4,4c,o]


def stem_fold4_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[7,7,C,O] (stride-2 'same' stem conv) -> [3,4,16C,4O]: the ResNet stem
    conv consuming the (8,2) space-to-depth of the raw input and emitting its
    output directly in (4,1)-H-FOLDED form — strides (1,1), padding
    ((1,1),(2,1)).

    Output cell (q, s) channel block p (phase-major (p, o), the fold_h
    order) is stem output (row 4q+p, col s), whose 7x7/s2 taps read original
    rows 8q+2p+dy-3 = 8(q+Dy-1)+ry and cols 2s+dx-3 = 2(s+Dx-2)+rx; solving
    gives dy = ry+3-2p+8(Dy-1) and dx = 2Dx+rx-1, zero where outside [0,7).
    Input channel order (ry, rx, c) matches space_to_depth(x, 8, 2).

    Why: the s2d(2) stem form leaves Cin=4 on the lane dim (the round-4 b64
    trace: 9.1 ms at 2.7x its write floor); this form has K=3*4*16C and the
    128-lane fold-4 output, probed 1.54x faster isolated, and its output is
    the layout the folded maxpool + layer1 chain consume with no fold copy.
    Exact: the kernel re-indexes the same 49 taps (plus structured zeros)."""
    kk, kk2, c, o = k.shape
    assert kk == 7 and kk2 == 7, "stem transform implemented for 7x7 stride-2"
    zero = jnp.zeros((c, o), k.dtype)
    rows = []
    for Dy in range(3):
        cols = []
        for Dx in range(4):
            blocks_in = []
            for ry in range(8):
                for rx in range(2):
                    dx = 2 * Dx + rx - 1
                    outs = []
                    for p in range(4):
                        dy = ry + 3 - 2 * p + 8 * (Dy - 1)
                        if 0 <= dy <= 6 and 0 <= dx <= 6:
                            outs.append(k[dy, dx])
                        else:
                            outs.append(zero)
                    blocks_in.append(jnp.concatenate(outs, axis=1))  # [C,4O]
            cols.append(jnp.concatenate(blocks_in, axis=0))  # [16C, 4O]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [3, 4, 16C, 4O]


@jax.custom_vjp
def max_pool3x3s2_fold4_to_fold2(xf: jnp.ndarray) -> jnp.ndarray:
    """max_pool 3x3/s2/p1 consumed from the (4,1)-H-folded stem and emitted
    (2,1)-H-folded: [B, Hs/4, W, 4C] -> [B, Hs/4, W/2, 2C].

    The W direction pools once on the folded tensor (every fold phase shares
    it). In H, pool row 2t reads stem rows 4t-1..4t+1 and row 2t+1 reads
    4t+1..4t+3 — with the stem already packed 4 rows per cell these are pure
    CHANNEL maxes between phase blocks (c3 shifted down one cell, c0, c1)
    and (c1, c2, c3): no strided row access at all, unlike the from-unfolded
    fold2 form whose two phase reduce_windows re-read 75% of the stem
    (13.2 ms/step at b64, round-5 trace). Exact (max is order-free);
    tests/test_h_fold.py pins it against the unfolded oracle."""
    b, hq, w, c4 = xf.shape
    c = c4 // 4
    wp = jax.lax.reduce_window(
        xf, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        padding=((0, 0), (0, 0), (1, 1), (0, 0)),
    )
    c0, c1 = wp[..., :c], wp[..., c : 2 * c]
    c2, c3 = wp[..., 2 * c : 3 * c], wp[..., 3 * c :]
    neg = jnp.full_like(c3[:, :1], -jnp.inf)
    c3m = jnp.concatenate([neg, c3[:, :-1]], axis=1)  # stem row 4t-1
    pool0 = jnp.maximum(jnp.maximum(c3m, c0), c1)  # pool row 2t
    pool1 = jnp.maximum(jnp.maximum(c1, c2), c3)  # pool row 2t+1
    return jnp.concatenate([pool0, pool1], axis=-1)


def _mpf42_fwd(xf):
    return max_pool3x3s2_fold4_to_fold2(xf), xf


def _mpf42_bwd(xf, g):
    # torch maxpool backward routes tie gradients through reduce_window's
    # select-and-scatter (same policy as max_pool3x3s2_fold2): run the
    # STANDARD pool vjp on the unfolded view and refold the cotangent — the
    # un/refolds are reshuffles XLA fuses into the neighbors.
    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    x = unfold_h(xf, 4)
    _, vjp = jax.vjp(pool, x)
    (dx,) = vjp(unfold_h(g, 2))
    return (fold_h(dx, 4),)


max_pool3x3s2_fold4_to_fold2.defvjp(_mpf42_fwd, _mpf42_bwd)


# The 2-tap shifted-anchor phase-conv variants (zero-redundancy conv1,
# 1.78x conv2) were built, exactness-tested, and measured ~7% SLOWER than
# the aligned 3x3 phase form on v5e (odd spatial dims cost more in layout
# than the saved MACs) — removed; post-mortem in PERF.md "Examined and
# closed".
