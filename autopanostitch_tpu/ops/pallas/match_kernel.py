"""Pallas TPU kernel: fused streaming exact 2-NN descriptor matching.

The XLA path (ops/matching.py global_knn) computes each query block's full
distance row in HBM and runs top_k on it — the (block, F) distance matrix
round-trips through HBM every step. This kernel keeps everything on-chip:

  for each query block (grid):
    for each target block (inner loop, double-buffered DMA from HBM):
      VMEM:  dist = -2 * Q_blk @ T_blk^T + ||t||^2       (MXU)
             mask same-image / invalid targets
             merge block-wise best/second into running (d1, d2, idx1)

Distances omit the query-norm term inside the loop (constant per row, does
not affect ranking) and add it at the end — the classic trick from the
reference's own GEMM matcher (`matchFeaturesScratch.m:322-366`), here fused
with the top-2 selection so nothing but (Fq, k<=2) ever leaves the chip.

The target matrix streams through a two-slot VMEM scratch with async DMA
(double buffering), so HBM reads overlap the MXU matmuls.

Status: numerically exact (100% agreement with the XLA path, verified in
interpret mode and on hardware), but on this toolchain the XLA streaming
top-k (`ops/matching.py global_knn`) is substantially faster (~40 Gdist/s
vs ~0.5 Gdist/s at 102k descriptors): with the small DMA blocks Mosaic
accepts here, the kernel is DMA-latency-bound, and larger blocks trip
Mosaic register-spill / compile-hang issues. The XLA path therefore stays
the production default; this kernel is kept as the Pallas reference
implementation and a harness for future Mosaic versions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e18  # plain python float: a jnp constant would be a captured tracer in the kernel


def _kernel(
    # inputs
    q_ref,  # (BQ, D+8) VMEM — query block (descriptor | qid | self | pad)
    t_hbm,  # (Ft, D+8) ANY/HBM — targets (descriptor | tid | tnorm | pad)
    # outputs
    idx_out,  # (BQ, 1) int32
    d1_out,  # (BQ, 1) f32
    d2_out,  # (BQ, 1) f32
    # scratch
    t_vmem,  # (2, BT, D+8) VMEM double buffer
    sem,  # (2,) DMA semaphores
    *,
    d: int,
    bt: int,
    ft: int,
):
    bq = q_ref.shape[0]
    n_blocks = ft // bt
    q_all = q_ref[:]  # (BQ, De) single aligned load
    q = q_all[:, :d]  # (BQ, D)
    side_q = q_all[:, d:]  # value slice (post-load), no alignment constraint
    qid = side_q[:, 0]
    qself = side_q[:, 1]

    def get_dma(slot, blk):
        return pltpu.make_async_copy(
            t_hbm.at[pl.ds(blk * bt, bt), :], t_vmem.at[slot], sem.at[slot]
        )

    get_dma(0, 0).start()

    def body(blk, carry):
        d1, d2, i1 = carry
        slot = blk % 2

        @pl.when(blk + 1 < n_blocks)
        def _():
            get_dma((blk + 1) % 2, blk + 1).start()

        get_dma(slot, blk).wait()
        t_all = t_vmem[slot]  # (BT, De) value load
        t = t_all[:, :d]
        side_t = t_all[:, d:]
        tid = side_t[:, 0]  # (BT,) image id as float
        tn = side_t[:, 1]  # (BT,) squared norms
        # -2 q.t + ||t||^2  (query norm omitted: constant per row)
        dist = jax.lax.dot_general(
            q, t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dist = tn[None, :] - 2.0 * dist  # (BQ, BT)
        # mask: same image, invalid target (tid == -2), self match
        tgt_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, bt), 1) + blk * bt
        tgt_fl = tgt_idx.astype(jnp.float32)
        bad = (tid[None, :] == qid[:, None]) | (tid[None, :] == -2.0)
        bad = bad | (tgt_fl == qself[:, None])
        dist = jnp.where(bad, _BIG, dist)

        # block best / second — min-based index extraction (argmin over the
        # lane axis makes Mosaic spill hundreds of MB of registers)
        tgt_f = tgt_fl
        b1 = jnp.min(dist, axis=1)  # (BQ,)
        bi = jnp.min(jnp.where(dist <= b1[:, None], tgt_f, _BIG), axis=1)
        dist2 = jnp.where(tgt_f == bi[:, None], _BIG, dist)
        b2 = jnp.min(dist2, axis=1)

        # merge (b1, b2, bi) into running (d1, d2, i1)
        new_d1 = jnp.minimum(d1, b1)
        new_i1 = jnp.where(b1 < d1, bi, i1)
        # second best = min of the losers
        cand2 = jnp.where(b1 < d1, jnp.minimum(d1, b2), jnp.minimum(d2, b1))
        return new_d1, cand2, new_i1

    init = (
        jnp.full((bq,), _BIG, jnp.float32),
        jnp.full((bq,), _BIG, jnp.float32),
        jnp.full((bq,), -1.0, jnp.float32),
    )
    d1, d2, i1 = jax.lax.fori_loop(0, n_blocks, body, init)
    idx_out[:, 0] = i1.astype(jnp.int32)
    d1_out[:, 0] = d1
    d2_out[:, 0] = d2


@partial(jax.jit, static_argnames=("bq", "bt", "interpret"))
def two_nn_pallas(
    desc_q: Array,  # (Fq, D)
    qid: Array,  # (Fq,) int32 image id of each query
    desc_t: Array,  # (Ft, D)
    tid: Array,  # (Ft,) int32 image id (-2 marks invalid targets)
    self_idx: Array | None = None,  # (Fq,) global index of query in targets
    bq: int = 128,
    bt: int = 512,
    interpret: bool = False,
):
    """Exact 2-NN (squared L2) with same-image/self exclusion.

    Returns (idx1 (Fq,), d1 (Fq,), d2 (Fq,)) with true squared distances.
    """
    Fq, D = desc_q.shape
    Ft = desc_t.shape[0]
    Fq_pad = ((Fq + bq - 1) // bq) * bq
    Ft_pad = ((Ft + bt - 1) // bt) * bt
    if self_idx is None:
        self_idx = jnp.full((Fq,), -1, jnp.int32)
    # pack side-band data as extra columns (keeps the kernel I/O to two
    # matrices); lane-pad to a full 128-lane group so every VMEM slice in
    # the kernel is tiling-aligned
    De = D + 128
    q = jnp.zeros((Fq_pad, De), jnp.float32)
    q = q.at[:Fq, :D].set(desc_q.astype(jnp.float32))
    q = q.at[:Fq, D].set(qid.astype(jnp.float32))
    q = q.at[Fq:, D].set(-1.0)
    q = q.at[:Fq, D + 1].set(self_idx.astype(jnp.float32))
    q = q.at[Fq:, D + 1].set(-1.0)
    tnorm = jnp.sum(desc_t.astype(jnp.float32) ** 2, axis=-1)
    t = jnp.zeros((Ft_pad, De), jnp.float32)
    t = t.at[:Ft, :D].set(desc_t.astype(jnp.float32))
    t = t.at[:Ft, D].set(tid.astype(jnp.float32))
    t = t.at[Ft:, D].set(-2.0)
    t = t.at[:Ft, D + 1].set(tnorm)

    grid = (Fq_pad // bq,)
    kernel = partial(_kernel, d=D, bt=bt, ft=Ft_pad)
    idx, d1, d2 = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bq, De), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # targets stay in HBM
            ],
            out_specs=(
                pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, bt, De), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Fq_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((Fq_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Fq_pad, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, t)
    qn = jnp.sum(desc_q.astype(jnp.float32) ** 2, axis=-1)
    d1 = d1[:Fq, 0] + qn
    d2 = d2[:Fq, 0] + qn
    # padded / fully-masked rows keep _BIG-ish values
    d1 = jnp.where(d1 > _BIG / 2, _BIG, jnp.maximum(d1, 0.0))
    d2 = jnp.where(d2 > _BIG / 2, _BIG, jnp.maximum(d2, 0.0))
    return idx[:Fq, 0], d1, d2
