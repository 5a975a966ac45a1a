"""Binary-descriptor (Hamming) matching on the MXU.

TPU-native equivalent of the reference's Hamming MEX kernels
(`mex/nearest2HammingExhaustiveMEX.cpp`, `...OMPMEX.cpp`) and the FLANN LSH
path (`mex/flann_knn.cpp:236-239`): for +-bit descriptors unpacked to
{0,1}^D, the Hamming distance is

    ham(a, b) = sum(a) + sum(b) - 2 a.b

— a single GEMM on the systolic array, exact, which on TPU beats both the
LUT-popcount loop and approximate LSH outright. A host C++/OpenMP kernel
(autopanostitch_tpu.native.hamming_2nn) covers CPU-only deployments.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = jnp.float32(1e18)


def unpack_bits(packed: Array) -> Array:
    """(N, nbytes) uint8 -> (N, nbytes*8) float32 in {0, 1} (LSB first)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts[None, None, :]) & 1
    return bits.reshape(packed.shape[0], -1).astype(jnp.float32)


def pack_bits(bits: Array) -> Array:
    """(N, D) {0,1} -> (N, ceil(D/8)) uint8 (LSB first)."""
    N, D = bits.shape
    pad = (-D) % 8
    b = jnp.pad(bits.astype(jnp.uint8), ((0, 0), (0, pad)))
    b = b.reshape(N, -1, 8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts[None, None, :], axis=-1).astype(jnp.uint8)


def hamming_distance_matrix(bits_a: Array, bits_b: Array) -> Array:
    """(Ma, D) x (Mb, D) {0,1} float -> (Ma, Mb) Hamming distances."""
    sa = jnp.sum(bits_a, axis=-1, keepdims=True)
    sb = jnp.sum(bits_b, axis=-1, keepdims=True).T
    ab = jax.lax.dot_general(
        bits_a, bits_b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return sa + sb - 2.0 * ab


@partial(jax.jit, static_argnames=())
def hamming_two_nn(packed_q: Array, mask_q: Array, packed_t: Array, mask_t: Array):
    """Exact 2-NN under Hamming distance for packed uint8 descriptors.

    Returns (idx1 (Mq,) int32, d1 (Mq,), d2 (Mq,)) like the MEX kernel
    (`nearest2HammingExhaustiveMEX.cpp:50-79`), but batched on the MXU.
    """
    bq = unpack_bits(packed_q)
    bt = unpack_bits(packed_t)
    d = hamming_distance_matrix(bq, bt)
    d = jnp.where(mask_t[None, :], d, _BIG)
    neg, idx = jax.lax.top_k(-d, 2)
    d1 = jnp.where(mask_q, -neg[:, 0], _BIG)
    d2 = jnp.where(mask_q, -neg[:, 1], _BIG)
    return idx[:, 0].astype(jnp.int32), d1, d2


@partial(jax.jit, static_argnames=("max_matches",))
def match_pair_hamming(
    packed_a: Array,
    mask_a: Array,
    packed_b: Array,
    mask_b: Array,
    ratio: float = 0.8,
    max_matches: int = 512,
):
    """Binary-descriptor pair matching: 2-NN Hamming + ratio + mutual check.

    Ratio is applied on raw Hamming distances (the reference's binary path,
    `matchFeaturesScratch.m:588-614`, also ratio-tests raw distances).
    """
    ia2b, d1, d2 = hamming_two_nn(packed_a, mask_a, packed_b, mask_b)
    ib2a, _, _ = hamming_two_nn(packed_b, mask_b, packed_a, mask_a)
    pass_ratio = d1 < ratio * d2
    mutual = ib2a[ia2b] == jnp.arange(packed_a.shape[0])
    ok = pass_ratio & mutual & mask_a & (d1 < _BIG)
    order = jnp.argsort(jnp.where(ok, d1, _BIG))
    take = min(max_matches, packed_a.shape[0])
    sel = order[:take]
    idx = jnp.stack([sel, ia2b[sel]], axis=-1).astype(jnp.int32)
    m = ok[sel]
    if take < max_matches:
        idx = jnp.pad(idx, ((0, max_matches - take), (0, 0)))
        m = jnp.pad(m, (0, max_matches - take))
    return jnp.where(m[:, None], idx, 0), m, jnp.sum(ok.astype(jnp.int32))
