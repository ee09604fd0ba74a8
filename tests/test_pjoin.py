"""Partitioned-join lookup (ops/pjoin.py) vs oracle + two-choice table.

The pjoin engine must return the exact count for present keys and 0
for absent ones, in input order, for any table size - the same
contract as engine/hashtable.KmerTable (and the reference's
KMC.getCount, Data/KMC.java:292-326).
"""

import numpy as np
import pytest

from kcftools_tpu.engine.hashtable import build_table
from kcftools_tpu.ops.pjoin import (
    build_pjoin_table,
    pjoin_lookup_np,
    route_queries,
)


@pytest.mark.parametrize("n_keys", [0, 1, 37, 5000, 200_000])
def test_pjoin_matches_oracle(n_keys):
    rng = np.random.default_rng(n_keys)
    k = 31
    keys = np.unique(
        rng.integers(0, 1 << (2 * k), max(n_keys, 1), dtype=np.uint64)
    )[:n_keys]
    counts = rng.integers(1, 255, keys.shape[0]).astype(np.uint32)
    tbl = build_pjoin_table(keys, counts, k)

    # queries: hits, misses, duplicates, and the all-A kmer edge
    n_q = 4096
    q = np.concatenate([
        rng.choice(keys, min(n_q, max(keys.size, 1)))
        if keys.size else np.empty(0, np.uint64),
        rng.integers(0, 1 << (2 * k), n_q, dtype=np.uint64),
        np.zeros(4, np.uint64),
    ])
    got = pjoin_lookup_np(tbl, q)

    oracle = dict(zip(keys.tolist(), counts.tolist()))
    exp = np.array([oracle.get(int(x), 0) for x in q], np.uint32)
    assert np.array_equal(got, exp)

    if keys.size:
        twochoice = build_table(keys, counts, k)
        assert np.array_equal(got, twochoice.lookup_np(q))


def test_pjoin_table_overflow_grows_tile():
    rng = np.random.default_rng(3)
    k = 31
    keys = np.unique(rng.integers(0, 1 << 62, 9000, dtype=np.uint64))
    counts = np.ones(keys.shape[0], np.uint32)
    tbl = build_pjoin_table(keys, counts, k, tile=128, fill=4.0)
    # fill > 1 forces few partitions; tile must have grown to cover
    assert tbl.tile >= 128
    assert tbl.P * tbl.tile >= keys.shape[0]
    q = keys[:500]
    assert np.array_equal(pjoin_lookup_np(tbl, q), counts[:500])


def test_route_queries_covers_all():
    rng = np.random.default_rng(9)
    k = 21
    q = rng.integers(0, 1 << (2 * k), 10000, dtype=np.uint64)
    qh, ql, src = route_queries(q, k, 64)
    live = src >= 0
    assert live.sum() == q.shape[0]
    assert np.array_equal(np.sort(src[live]), np.arange(q.shape[0]))
