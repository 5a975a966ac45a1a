"""Pallas TPU kernel: batched keypoint window gather via async DMA.

SIFT's per-keypoint phase needs an ~80x80 gradient window around every
keypoint, sliced at a runtime (level, y, x) from the octave's gradient
stack. Under vmap, `lax.dynamic_slice` lowers to an XLA gather that moves
~1.5 GB/s on this toolchain — the window FETCH, not the window arithmetic,
dominated feature extraction (measured: 1.6 s of a 2.2 s stage at 100
images).

This kernel issues one DMA per keypoint window (HBM -> VMEM output block),
eight outstanding copies at a time so DMA latency overlaps. Mosaic
constraints shape the design:
- HBM slice starts must be (8, 128)-tile aligned -> callers align starts
  down (`aligned_starts`) and gather (win+8, win+128..256) slabs; the
  downstream soft-binning math is offset-tolerant (pixels are weighted by
  distance from the keypoint's in-window position), so the border costs
  only arithmetic on zero-weighted pixels.
- Rank-1 SMEM scalar blocks must match the XLA int32 tiling (1024) -> the
  grid is (K/1024, 1024/kp_per_step): each outer step owns a 1024-scalar
  block, each inner step issues kp_per_step DMAs.
- SMEM specs do not vmap -> the image batch is FLATTENED into the level
  axis instead (stack per-image gradient volumes along S and index level
  `img * S + lev`), so one call serves a whole image group.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SCALAR_BLOCK = 1024  # rank-1 SMEM block granularity (matches XLA s32 layout T(1024))


def aligned_starts(ys: Array, xs: Array, win: int, Ho: int, Wo: int):
    """Align window starts down to the TPU (8, 128) tiling.

    Requires Ho % 8 == 0 and Wo % 128 == 0 (pad the source first) and
    win % 8 == 0. Returns (y8, x128, rows, cols): per-keypoint aligned
    starts plus the STATIC window shape covering [y, y + win) x
    [x, x + win) for ys in [0, Ho - win], xs in [0, Wo - win].
    """
    assert Ho % 8 == 0 and Wo % 128 == 0 and win % 8 == 0, (Ho, Wo, win)
    rows = min(win + 8, Ho)
    cols = min(((win // 128) + 2) * 128, Wo)
    y8 = jnp.minimum((ys.astype(jnp.int32) // 8) * 8, Ho - rows)
    x128 = jnp.minimum((xs.astype(jnp.int32) // 128) * 128, Wo - cols)
    return y8, x128, rows, cols


def _kernel(lev_ref, ys_ref, xs_ref, src_ref, out_ref, sems, *,
            kp: int, rows: int, cols: int):
    j = pl.program_id(1)

    def dma(jj):
        k = j * kp + jj
        l = lev_ref[k]
        y = pl.multiple_of(ys_ref[k], 8)
        x = pl.multiple_of(xs_ref[k], 128)
        return pltpu.make_async_copy(
            src_ref.at[:, l, pl.ds(y, rows), pl.ds(x, cols)],
            out_ref.at[jj],
            sems.at[jj],
        )

    for jj in range(kp):  # kp outstanding DMAs hide per-copy latency
        dma(jj).start()
    for jj in range(kp):
        dma(jj).wait()


@partial(jax.jit, static_argnames=("rows", "cols", "kp_per_step", "interpret"))
def gather_windows(
    src: Array,  # (C, S, H, W) float32 — e.g. stacked dx/dy gradient maps;
    #              for image batches, stack volumes along S and offset lev
    lev: Array,  # (K,) int32 level index, in [0, S)
    y8: Array,  # (K,) int32 aligned window top (multiple of 8)
    x128: Array,  # (K,) int32 aligned window left (multiple of 128)
    rows: int,
    cols: int,
    kp_per_step: int = 8,
    interpret: bool = False,
) -> Array:
    """(K, C, rows, cols) windows src[:, lev[k], y8[k]:+rows, x128[k]:+cols].

    K must be a multiple of 1024 (pad and mask at the call site); starts
    must be tile-aligned (see :func:`aligned_starts`).
    """
    C = src.shape[0]
    K = lev.shape[0]
    assert K % _SCALAR_BLOCK == 0, K
    assert _SCALAR_BLOCK % kp_per_step == 0
    grid = (K // _SCALAR_BLOCK, _SCALAR_BLOCK // kp_per_step)
    smem = lambda: pl.BlockSpec(  # noqa: E731
        (_SCALAR_BLOCK,), lambda i, j: (i,), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        partial(_kernel, kp=kp_per_step, rows=rows, cols=cols),
        grid=grid,
        in_specs=[
            smem(),
            smem(),
            smem(),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (kp_per_step, C, rows, cols),
            lambda i, j: (i * (_SCALAR_BLOCK // kp_per_step) + j, 0, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((K, C, rows, cols), src.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((kp_per_step,))],
        interpret=interpret,
    )(lev, y8, x128, src)
