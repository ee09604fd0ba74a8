"""Sharded scorer vs the single-device scorer on the 8-device CPU mesh.

The sharded path guards the wheat-scale configuration (SURVEY
section 2.4: table partitioned across chips, psum over the table
axis); its shard-ownership arithmetic (parallel/sharded.py:46-59) gets
adversarial coverage here: every (data, table) factorization incl.
partial meshes, non-divisible batch sizes that force padding, tables
right at the two-choice grow threshold, written-then-read KMC
databases, wide-k rejection, and a randomized differential fuzz loop.
"""

import numpy as np
import pytest

from kcftools_tpu.engine.encode import str_to_kmer
from kcftools_tpu.engine.hashtable import build_table
from kcftools_tpu.engine.pipeline import PAD_MARGIN, WindowScorer
from kcftools_tpu.engine.windows import pad_batch_varlen
from kcftools_tpu.io.fasta import codes_from_str
from kcftools_tpu.parallel.mesh import make_mesh
from kcftools_tpu.parallel.sharded import ShardedWindowScorer

from .gen import mutate, random_seq
from .oracle import count_db


def _batch(genome, windows_spec):
    windows = [genome[a:b] for a, b in windows_spec]
    pad = max(len(w) for w in windows) + PAD_MARGIN
    codes, valids = zip(*[codes_from_str(w) for w in windows])
    return pad_batch_varlen(list(codes), list(valids), pad)


def _table_from_seq(rng, sample, k, load_factor=0.8):
    db = count_db([sample], k)
    kmers = np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    counts = np.array(list(db.values()), dtype=np.uint32)
    return build_table(kmers, counts, k, load_factor=load_factor)


def _assert_same(tbl, bcodes, bvalid, wlen, data, table):
    import jax

    ref = WindowScorer(tbl).score_batch(bcodes, bvalid, wlen)
    mesh = make_mesh(data=data, table=table,
                     devices=jax.devices()[: data * table])
    got = ShardedWindowScorer(tbl, mesh).score_batch(bcodes, bvalid, wlen)
    for key in ref:
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)


@pytest.mark.parametrize("data,table", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single(rng, data, table):
    k = 31
    genome = random_seq(rng, 6000)
    sample = mutate(rng, genome, snp_rate=0.01, del_rate=0.001)
    tbl = _table_from_seq(rng, sample, k)
    bcodes, bvalid, wlen = _batch(
        genome, [(i, i + 500) for i in range(0, 5400, 470)]
    )
    _assert_same(tbl, bcodes, bvalid, wlen, data, table)


@pytest.mark.parametrize("data,table", [
    (1, 1), (2, 1), (1, 2), (2, 2), (4, 1), (1, 4), (2, 3),
])
def test_partial_meshes(rng, data, table):
    """Meshes that do not use all 8 devices, including a non-power-of
    -two table axis (3 shards must divide the bucket count -> the
    scorer re-shards; 3 does not divide a power of two, so it must
    raise cleanly rather than mis-own buckets)."""
    k = 21
    genome = random_seq(rng, 3000)
    tbl = _table_from_seq(rng, mutate(rng, genome, 0.02, 0.0), k)
    bcodes, bvalid, wlen = _batch(
        genome, [(i, i + 300) for i in range(0, 2700, 290)]
    )
    if table == 3:
        with pytest.raises(Exception):
            _assert_same(tbl, bcodes, bvalid, wlen, data, table)
        return
    _assert_same(tbl, bcodes, bvalid, wlen, data, table)


@pytest.mark.parametrize("n_windows", [1, 3, 5, 7, 9, 13])
def test_non_divisible_batches(rng, n_windows):
    """Batch sizes not divisible by the data axis force the padding
    path; padded rows must not leak into real rows' results."""
    k = 31
    genome = random_seq(rng, 4000)
    tbl = _table_from_seq(rng, mutate(rng, genome, 0.01, 0.001), k)
    spec = [(i * 250, i * 250 + 240 + (i % 3) * 7)
            for i in range(n_windows)]
    bcodes, bvalid, wlen = _batch(genome, spec)
    _assert_same(tbl, bcodes, bvalid, wlen, 4, 2)


def test_table_near_grow_threshold(rng):
    """A table built at load factor ~1.0 stresses bucket overflow +
    the cuckoo eviction path; sharded lookups must stay exact."""
    k = 31
    genome = random_seq(rng, 5000)
    tbl = _table_from_seq(rng, mutate(rng, genome, 0.01, 0.0), k,
                          load_factor=0.99)
    bcodes, bvalid, wlen = _batch(
        genome, [(i, i + 400) for i in range(0, 4500, 380)]
    )
    _assert_same(tbl, bcodes, bvalid, wlen, 2, 4)


def test_written_then_read_db(rng, tmp_path):
    """End-to-end through the real KMC binary format: write the DB,
    re-read it, shard the re-read table 8 ways."""
    from kcftools_tpu.io.kmc import KMCReader, write_kmc_db

    k = 31
    genome = random_seq(rng, 4000)
    sample = mutate(rng, genome, snp_rate=0.02, del_rate=0.001)
    db = count_db([sample], k)
    kmers = np.sort(
        np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    )
    cmap = {str_to_kmer(s): c for s, c in db.items()}
    counts = np.array([cmap[int(x)] for x in kmers], np.uint32)
    write_kmc_db(str(tmp_path / "d"), kmers, counts, k, counter_size=2)
    r = KMCReader(str(tmp_path / "d"))
    tbl = build_table(r.kmers, r.counts, k, both_strands=r.both_strands)
    bcodes, bvalid, wlen = _batch(
        genome, [(i, i + 350) for i in range(0, 3500, 333)]
    )
    _assert_same(tbl, bcodes, bvalid, wlen, 1, 8)


def test_wide_k_rejected(rng):
    """k > 32 keys cannot enter the (hi, lo)-uint32 sharded table."""
    from kcftools_tpu.engine.hashtable import build_table as bt

    with pytest.raises(Exception):
        keys = np.arange(100, dtype=np.uint64)
        tbl = bt(keys, np.ones(100, np.uint32), k=40)
        mesh = make_mesh(data=1, table=8)
        ShardedWindowScorer(tbl, mesh)


def test_fuzz_differential(rng):
    """Randomized shapes: window lengths, batch sizes, mesh splits."""
    k = 25
    for trial in range(4):
        glen = int(rng.integers(1500, 4000))
        genome = random_seq(rng, glen)
        tbl = _table_from_seq(
            rng, mutate(rng, genome, 0.015, 0.002), k
        )
        nw = int(rng.integers(1, 12))
        spec = []
        for _ in range(nw):
            a = int(rng.integers(0, glen - k - 50))
            b = a + int(rng.integers(k + 5, min(600, glen - a)))
            spec.append((a, b))
        bcodes, bvalid, wlen = _batch(genome, spec)
        data, table = [(2, 4), (4, 2), (8, 1), (1, 8)][trial]
        _assert_same(tbl, bcodes, bvalid, wlen, data, table)
