"""Minimal repro of the N>=160 gain-statistics TPU kernel fault.

On the 2026-08 TPU toolchain, the single-program (lax.scan-over-chunks)
form of `overlap_statistics_imagespace` reproducibly crashes the TPU
runtime ("kernel fault" / worker restart) once the image count reaches
~160, while the SAME math dispatched chunk-by-chunk from the host runs
fine (docs/ROUND4.md, "N>=160 gain-statistics kernel fault"). The
production code therefore switches to the host-dispatched loop at
`gain.GAIN_HOST_LOOP_MIN_N`; numeric equivalence of the two paths is
pinned by `tests/test_gain.py::test_gain_oneshot_matches_host_loop`.

Usage (on a REAL TPU — the fault does not reproduce on CPU):

    python tools/repro_gain_fault.py 160 oneshot   # expected: crash
    python tools/repro_gain_fault.py 160 hostloop  # expected: ok
    python tools/repro_gain_fault.py 128 oneshot   # expected: ok

Exit status 0 and a printed checksum mean the path survived; a worker
crash surfaces as an UNAVAILABLE RPC error (relay) or process abort.
"""

import sys

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    mode = sys.argv[2] if len(sys.argv) > 2 else "oneshot"
    assert mode in ("oneshot", "hostloop"), mode

    import jax.numpy as jnp

    from autopanostitch_tpu.models import gain

    rng = np.random.default_rng(0)
    # accepts "HxW" as argv[3]: the fault is SHAPE-dependent — the r4
    # grid-chunk host loop survived 96x128 views up to N=256 but crashed
    # at pano200's 288x384 (2026-08-21), which is why the production path
    # is now block-pair accumulation (gain.GAIN_BLOCK)
    h, w = (96, 128)
    if len(sys.argv) > 3:
        h, w = (int(x) for x in sys.argv[3].split("x"))
    images = jnp.asarray(rng.random((n, h, w, 3), np.float32))
    feathers = jnp.ones((n, h, w), jnp.float32)
    sizes = np.tile(np.array([h, w], np.int32), (n, 1))
    # a ring of yaw rotations, shared focal
    yaws = np.linspace(0, 2 * np.pi, n, endpoint=False)
    R = np.stack(
        [
            np.array(
                [
                    [np.cos(a), 0, -np.sin(a)],
                    [0, 1, 0],
                    [np.sin(a), 0, np.cos(a)],
                ],
                np.float32,
            )
            for a in yaws
        ]
    )
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 120.0
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    K[:, 2, 2] = 1.0

    if mode == "oneshot":
        Nij, sumC = gain._overlap_imagespace_oneshot(
            images, feathers, jnp.asarray(sizes), jnp.asarray(R),
            jnp.asarray(K), 5, 512, 1.0, jnp.zeros((n,), jnp.float32), False,
        )
    else:
        Nij, sumC = gain.overlap_statistics_imagespace(
            images, feathers, jnp.asarray(sizes), jnp.asarray(R),
            jnp.asarray(K), stride=5, force_host_loop=True,
        )
    print(
        f"n={n} mode={mode} ok: Nij sum={float(np.asarray(Nij).sum()):.1f} "
        f"sumC sum={float(np.asarray(sumC).sum()):.1f}"
    )


if __name__ == "__main__":
    main()
