"""Shape buckets: bounded executable sets across workloads.

Under jit every distinct input shape compiles a distinct executable, and
on the relay harness each executable costs an AOT round-trip (seconds to
minutes for the big stage programs). Datasets differ mostly in COUNTS —
views N, pooled descriptors F, candidate pairs P, component cameras —
so stages that pad those counts to a small multiplicative grid share
executables across datasets (a 38-photo and a 35-photo sheet hit the
same bucket) and bound total compilation the way LLM-serving frameworks
bound sequence-length compiles.

The grid {1, 1.25, 1.5, 1.75} x 2^k caps padding waste at 25% and yields
at most 4 buckets per octave. All padded rows/slots are masked by the
existing fixed-capacity masking discipline (zero images, mask=False
keypoints, weight-0 pairs), so results are bit-identical to unpadded
runs wherever that discipline holds (tested).
"""

from __future__ import annotations

GRID = (1.0, 1.25, 1.5, 1.75)


def bucket(n: int, floor: int = 4) -> int:
    """Smallest c * 2^k >= n with c in GRID; at least `floor`."""
    n = max(int(n), 1)
    if n <= floor:
        return floor
    p = 1
    while p * 2 <= n:
        p *= 2
    # candidates within the octave [p, 2p]
    for c in GRID:
        b = int(round(c * p))
        if b >= n:
            return b
    return p * 2


def coarse(x: int, ladder: tuple = (64, 256, 1024)) -> int:
    """Smallest ladder rung >= x (doubling past the top): COARSE buckets
    for arrays that are pure gather sources — their size barely affects
    runtime, so wide rungs maximize executable sharing across datasets."""
    for r in ladder:
        if x <= r:
            return r
    r = ladder[-1]
    while r < x:
        r *= 2
    return r
