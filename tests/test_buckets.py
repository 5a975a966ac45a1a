"""Shape-bucket utilities (utils/buckets.py) and their pipeline
integration points: padded slots must be inert (masked) so bucketing is
results-invariant while bounding the executable set across datasets."""

import numpy as np

from autopanostitch_tpu.utils import buckets


def test_bucket_grid():
    assert buckets.bucket(1) == 4  # floor
    assert buckets.bucket(4) == 4
    assert buckets.bucket(6) == 6  # 1.5 * 4
    assert buckets.bucket(22) == 24
    assert buckets.bucket(35) == 40
    assert buckets.bucket(38) == 40  # a 38- and a 35-photo sheet share
    assert buckets.bucket(100) == 112
    assert buckets.bucket(128) == 128
    for n in range(1, 3000):
        b = buckets.bucket(n)
        assert b >= n
        assert b <= max(4, int(np.ceil(1.25 * n)))  # waste capped at 25%


def test_coarse_ladder():
    assert buckets.coarse(6) == 64
    assert buckets.coarse(38) == 64
    assert buckets.coarse(100) == 256
    assert buckets.coarse(200) == 256
    assert buckets.coarse(1500) == 2048


def test_matching_bucket_invariance():
    """global matcher results are identical whether or not the image axis
    is padded to its bucket: padded rows carry mask=False."""
    import jax.numpy as jnp

    from autopanostitch_tpu.ops import matching as mt

    rng = np.random.default_rng(0)
    N, K, D = 5, 32, 16  # bucket(5) = 5? grid: 5 -> 5 (1.25*4)
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = rng.random((N, K)) < 0.9

    out_plain = mt.global_match_stack(jnp.asarray(desc), jnp.asarray(mask), k=4)
    Nb = N + 3  # emulate a padded call
    desc_p = np.concatenate([desc, np.zeros((3, K, D), np.float32)])
    mask_p = np.concatenate([mask, np.zeros((3, K), bool)])
    out_pad = mt.global_match_stack(jnp.asarray(desc_p), jnp.asarray(mask_p), k=4)
    F = N * K
    for a, b in zip(out_plain, out_pad):
        a = np.asarray(a)[:F]
        b = np.asarray(b)[:F]
        if a.dtype.kind == "f":
            # distances match to fp rounding only: the padded pool changes
            # the matmul blocking, so last-ulp differences are expected
            fin = a < 1e17
            assert np.allclose(a[fin], b[fin], rtol=1e-5, atol=1e-6)
        else:
            # the DECISIONS (neighbour ids, accepted set) are identical
            assert np.array_equal(a, b)


def test_gain_bucket_invariance():
    """gain solve identical with the image stack padded to its N bucket
    (padded cameras have size 0 -> zero stats rows/cols, sliced off)."""
    import jax.numpy as jnp

    from autopanostitch_tpu.config import GainConfig
    from autopanostitch_tpu.models import gain as gain_stage
    from autopanostitch_tpu.ops import sampling as samp

    rng = np.random.default_rng(1)
    n, H, W = 5, 48, 64
    imgs = rng.random((n, H, W, 3)).astype(np.float32)
    sizes = np.tile(np.array([H, W], np.int32), (n, 1))
    feathers = samp.feather_stack(jnp.asarray(sizes), H, W)
    R = np.stack([np.eye(3, dtype=np.float32)] * n)
    # slight yaws so cameras overlap
    for i in range(n):
        a = 0.08 * i
        R[i] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
    K = np.stack([np.array([[60, 0, (W - 1) / 2], [0, 60, (H - 1) / 2], [0, 0, 1]],
                           np.float32)] * n)
    cfg = GainConfig(grid_stride=4)
    g = gain_stage.compute_gains_rotational(
        jnp.asarray(imgs), feathers, R, K, sizes, cfg
    )
    assert g.shape == (n, 3)
    assert np.isfinite(g).all()
    # invariance vs an explicitly larger pad (double padding must not
    # change the sliced solve)
    Nij, sumC = gain_stage.overlap_statistics_imagespace(
        jnp.asarray(np.pad(imgs, ((0, 3), (0, 0), (0, 0), (0, 0)))),
        jnp.asarray(np.pad(np.asarray(feathers), ((0, 3), (0, 0), (0, 0)))),
        jnp.asarray(np.pad(sizes, ((0, 3), (0, 0))), jnp.int32),
        jnp.asarray(np.concatenate([R, np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))])),
        jnp.asarray(np.concatenate([K, np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))])),
        4,
    )
    g2 = gain_stage.solve_gains(np.asarray(Nij)[:n, :n], np.asarray(sumC)[:n, :n], cfg)
    assert np.allclose(g, g2, atol=1e-5)
