"""Pallas thin-channel 3x3 conv — the U-Net decoder tail's hot op.

Packs Gx = 128/O ADJACENT OUTPUT COLUMNS into the lane dimension so every
matmul drives all 128 lanes:

  out[y, g*Gx + jo, o]  =  sum_dy  U_dy[y, g, :] @ rhs_dy[:, jo*O + o]

where U_dy[y, g, (jc, c)] = x[y + dy - 1, g*Gx + jc - 1, c] for jc in
0..Gx+1 (the group's Gx columns plus a 1-column halo each side, K=(Gx+2)C),
and rhs_dy is the banded kernel matrix rhs[(jc,c),(jo,o)] = w[dy, jc-jo, c, o]
for jc-jo in {0,1,2}. Nominal MXU utilization = 3/(Gx+2): 30% at O=16, 50%
at O=32, 75% at O=64. MEASURED on v5e, Mosaic's matmul pipeline at these
[M, K<=512, N=128] shapes caps at ~21 GF/ms, so the kernel LOSES to both
XLA's conv and the s2d phase-form rewrite (PERF.md round-2 notes) — it is a
standalone op, not the decoder's production path.

The unfold U is built IN VMEM by the DMA engine (bulk groups + two halo-column
copies per row block; input is read ~(Gx+2)/Gx = 1.25x, once), never
materialized in HBM. dy reuses the same U at three row offsets.

Backward: custom_vjp delegates to the XLA reference conv's VJP (training
correctness; the forward-inference pipeline is where this op dominates).

Matches the torch semantics of nn.Conv2d(C, O, 3, padding=1) — reference
hot loop: src/segmentation_models/decoders/unet/decoder.py:38-46.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_conv(x, w, bias):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=dn)
    if bias is not None:
        out = out + bias
    return out


def supports(x_shape, w_shape, block_h: int = 16) -> bool:
    """Kernel applicability: SAME-pad 3x3, O divides 128 (lane packing),
    W divisible by the group width, H by the row block."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, h, w_, c = x_shape
    kh, kw, ci, o = w_shape
    if (kh, kw) != (3, 3) or ci != c:
        return False
    if o not in (16, 32, 64) or c > 256:
        return False
    gx = 128 // o
    return w_ % gx == 0 and h % block_h == 0 and (w_ // gx) % 8 == 0


def _banded_rhs(w: jnp.ndarray, gx: int, dtype) -> jnp.ndarray:
    """[3,3,C,O] -> [3, (Gx+2)*C, Gx*O]; rhs[dy, (jc,c), (jo,o)] =
    w[dy, jc-jo, c, o] for jc-jo in {0,1,2}."""
    kh, kw, c, o = w.shape
    k = (gx + 2) * c
    n = gx * o
    jc = np.arange(gx + 2)[:, None]
    jo = np.arange(gx)[None, :]
    dx = jc - jo  # [gx+2, gx]
    mask = (dx >= 0) & (dx <= 2)
    dx_safe = np.clip(dx, 0, 2)
    # gather: band[dy, jc, c, jo, o] = w[dy, dx, c, o] * mask
    band = w[:, dx_safe]  # [3, gx+2, gx, C, O]
    band = band * jnp.asarray(mask[None, :, :, None, None], w.dtype)
    # K-row order must match the kernel's U lane layout:
    # [cols 0..Gx-1 (bulk), col -1 (L halo), col Gx (R halo)]
    perm = list(range(1, gx + 1)) + [0, gx + 1]
    band = band[:, np.asarray(perm)]
    band = jnp.transpose(band, (0, 1, 3, 2, 4))  # [3, gx+2, C, gx, O]
    return band.reshape(3, k, n).astype(dtype)


def _kernel(x4_ref, rhs_ref, out_ref, u_ref, sems, *,
            th: int, twg: int, gxc: int, c: int, h: int, nh: int,
            out_dtype):
    ih = pl.program_id(1)
    y0 = ih * th
    k_u = u_ref.shape[-1]

    # ---- build the unfold U[row, group, (jc, c)] ----
    # lane layout: [cols 0..Gx-1 (bulk, GxC), col -1 (C), col Gx (C)].
    # Only full-width, tiling-aligned DMAs touch HBM; the 1-group shifts
    # for the halo columns happen in VMEM (their data is already in the
    # bulk lanes of the neighboring group).
    b_idx = pl.program_id(0)

    def dma(src, dst, sem):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        return cp

    main = dma(
        x4_ref.at[b_idx, pl.ds(y0, th)],
        u_ref.at[pl.ds(1, th), :, 0:gxc],
        sems.at[0],
    )

    # top halo row (y0-1) / bottom halo row (y0+TH), zeros at image edges
    @pl.when(ih > 0)
    def _():
        dma(x4_ref.at[b_idx, pl.ds(jnp.maximum(y0 - 1, 0), 1)],
            u_ref.at[pl.ds(0, 1), :, 0:gxc], sems.at[1]).wait()

    @pl.when(ih == 0)
    def _():
        u_ref[0:1, :, 0:gxc] = jnp.zeros((1, twg, gxc), u_ref.dtype)

    @pl.when(ih < nh - 1)
    def _():
        dma(x4_ref.at[b_idx, pl.ds(jnp.minimum(y0 + th, h - 1), 1)],
            u_ref.at[pl.ds(th + 1, 1), :, 0:gxc], sems.at[1]).wait()

    @pl.when(ih == nh - 1)
    def _():
        u_ref[th + 1:th + 2, :, 0:gxc] = jnp.zeros((1, twg, gxc), u_ref.dtype)

    main.wait()

    # halo columns via 1-group sublane shifts of the bulk lanes:
    # col -1 of group g = col Gx-1 of group g-1; col Gx of g = col 0 of g+1
    left = u_ref[:, 0:twg - 1, pl.ds(gxc - c, c)]
    u_ref[:, 1:twg, pl.ds(gxc, c)] = left
    u_ref[:, 0:1, pl.ds(gxc, c)] = jnp.zeros((th + 2, 1, c), u_ref.dtype)
    right = u_ref[:, 1:twg, 0:c]
    u_ref[:, 0:twg - 1, pl.ds(gxc + c, c)] = right
    u_ref[:, twg - 1:twg, pl.ds(gxc + c, c)] = jnp.zeros(
        (th + 2, 1, c), u_ref.dtype)

    # ---- 3 banded matmuls over dy ----
    acc = jnp.zeros((th * twg, out_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        lhs = u_ref[dy:dy + th].reshape(th * twg, k_u)
        acc += jnp.dot(lhs, rhs_ref[dy],
                       preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, twg, -1).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def thin_conv3x3(x, w, bias=None, block_h: int = 16, interpret: bool = False):
    """conv3x3 SAME, NHWC/HWIO, lane-packed Pallas kernel; falls back to
    lax.conv when shapes don't fit the packing (see `supports`)."""
    return _thin_conv_fwd_impl(x, w, bias, block_h, interpret)


def _thin_conv_fwd_impl(x, w, bias, block_h, interpret):
    if not supports(x.shape, w.shape, block_h):
        return _reference_conv(x, w, bias)
    b, h, w_, c = x.shape
    o = w.shape[-1]
    gx = 128 // o
    twg = w_ // gx
    gxc = gx * c
    th = block_h
    nh = h // th
    k_u = gxc + 2 * c

    rhs_dtype = x.dtype
    rhs = _banded_rhs(w, gx, rhs_dtype)  # [3, (gx+2)c, gx*o]
    x4 = x.reshape(b, h, twg, gxc)

    kern = functools.partial(
        _kernel, th=th, twg=twg, gxc=gxc, c=c, h=h, nh=nh, out_dtype=x.dtype
    )
    out4 = pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x4 stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rhs
        ],
        out_specs=pl.BlockSpec(
            (1, th, twg, gx * o), lambda bi, ii: (bi, ii, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, twg, gx * o), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, twg, k_u), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(x4, rhs)
    out = out4.reshape(b, h, w_, o)
    if bias is not None:
        out = out + bias
    return out


def _fwd(x, w, bias, block_h, interpret):
    return _thin_conv_fwd_impl(x, w, bias, block_h, interpret), (x, w, bias)


def _bwd(block_h, interpret, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _reference_conv(xx, ww, bb), x, w, bias)
    dx, dw, db = vjp(g)
    if bias is None:
        db = None
    return dx, dw, db


thin_conv3x3.defvjp(_fwd, _bwd)
