import numpy as np

from kcftools_tpu.engine.hashtable import build_table


def test_build_and_lookup(rng):
    k = 31
    n = 20000
    kmers = np.unique(
        rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
        & np.uint64((1 << (2 * k)) - 1)
    )
    counts = rng.integers(1, 255, size=kmers.size, dtype=np.uint32)
    table = build_table(kmers, counts, k)

    got = table.lookup_np(kmers)
    np.testing.assert_array_equal(got, counts)

    # absent keys -> 0
    absent = np.setdiff1d(
        rng.integers(0, 1 << 62, size=5000, dtype=np.uint64)
        & np.uint64((1 << (2 * k)) - 1),
        kmers,
    )
    np.testing.assert_array_equal(table.lookup_np(absent), 0)


def test_small_k_table(rng):
    k = 11
    kmers = np.unique(rng.integers(0, 1 << (2 * k), size=500, dtype=np.uint64))
    counts = np.arange(1, kmers.size + 1, dtype=np.uint32)
    table = build_table(kmers, counts, k)
    np.testing.assert_array_equal(table.lookup_np(kmers), counts)
