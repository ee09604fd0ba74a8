"""Streaming sharded-table loader (parallel/loader.py): bounded-RAM
multi-pass KMC ingest into per-shard device tables must score exactly
like the fully-materialized single-device path (VERDICT r1 #2)."""

import numpy as np
import pytest

from kcftools_tpu.engine.encode import str_to_kmer
from kcftools_tpu.engine.hashtable import build_table
from kcftools_tpu.engine.pipeline import PAD_MARGIN, WindowScorer
from kcftools_tpu.engine.windows import pad_batch_varlen
from kcftools_tpu.io.fasta import codes_from_str
from kcftools_tpu.io.kmc import KMCReader
from kcftools_tpu.parallel.loader import ShardedTableLoader
from kcftools_tpu.parallel.mesh import make_mesh

from .gen import db_from_seqs, mutate, random_seq

K = 31


@pytest.fixture(scope="module")
def dbws(tmp_path_factory):
    rng = np.random.default_rng(12)
    tmp = tmp_path_factory.mktemp("loader")
    genome = random_seq(rng, 6000)
    sample = mutate(rng, genome, snp_rate=0.01, del_rate=0.001)
    prefix = str(tmp / "db")
    db = db_from_seqs(prefix, [sample], K)
    windows = [genome[i : i + 500] for i in range(0, 5400, 470)]
    pad = max(len(w) for w in windows) + PAD_MARGIN
    codes, valids = zip(*[codes_from_str(w) for w in windows])
    bcodes, bvalid, wlen = pad_batch_varlen(list(codes), list(valids), pad)

    kmers = np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    counts = np.array(list(db.values()), dtype=np.uint32)
    tbl = build_table(kmers, counts, K)
    ref = WindowScorer(tbl).score_batch(bcodes, bvalid, wlen)
    return {
        "prefix": prefix, "batch": (bcodes, bvalid, wlen), "ref": ref,
        "n_keys": len(db),
    }


def test_iter_slabs_covers_db(dbws):
    r_full = KMCReader(dbws["prefix"])
    r_stream = KMCReader(dbws["prefix"], materialize=False)
    assert r_stream.kmers is None  # nothing materialized
    parts_k, parts_c = [], []
    for kmers, counts in r_stream.iter_slabs(slab_records=1000):
        parts_k.append(np.asarray(kmers))
        parts_c.append(counts)
    got_k = np.concatenate(parts_k)
    got_c = np.concatenate(parts_c)
    np.testing.assert_array_equal(got_k, r_full.kmers)
    np.testing.assert_array_equal(got_c, r_full.counts)


@pytest.mark.parametrize("data,table", [(4, 2), (2, 4), (1, 8)])
def test_streamed_loader_matches_single(dbws, data, table):
    mesh = make_mesh(data=data, table=table)
    loader = ShardedTableLoader(dbws["prefix"], mesh, slab_records=777)
    scorer = loader.load_scorer(min_count=1)
    got = scorer.score_batch(*dbws["batch"])
    for key in dbws["ref"]:
        np.testing.assert_array_equal(got[key], dbws["ref"][key],
                                      err_msg=key)


def test_loader_multi_pass_under_ram_budget(dbws):
    """A budget that holds only one shard at a time forces one pass per
    local shard; the result must not change."""
    mesh = make_mesh(data=1, table=8)
    loader = ShardedTableLoader(
        dbws["prefix"], mesh, ram_budget_bytes=1, slab_records=500
    )
    t_axis, nb_local, per_pass = loader._plan(
        max(16, 8 * 2)
    )
    assert per_pass == 1  # the budget really forces multiple passes
    scorer = loader.load_scorer(min_count=1)
    got = scorer.score_batch(*dbws["batch"])
    for key in dbws["ref"]:
        np.testing.assert_array_equal(got[key], dbws["ref"][key],
                                      err_msg=key)


def test_shard_overflow_grows(dbws):
    """Starting from a deliberately undersized bucket count, per-shard
    overflow must grow the global table and still produce exact
    results (the bucket-pressure path)."""
    mesh = make_mesh(data=1, table=8)
    loader = ShardedTableLoader(dbws["prefix"], mesh, slab_records=911)
    tbl, nb_total = loader.load(nb_total=16)  # 2 buckets/shard: overflows
    assert nb_total > 16
    from kcftools_tpu.parallel.sharded import ShardedWindowScorer

    scorer = ShardedWindowScorer.from_device_table(
        tbl, nb_total, mesh, k=K, both_strands=True, min_count=1
    )
    got = scorer.score_batch(*dbws["batch"])
    for key in dbws["ref"]:
        np.testing.assert_array_equal(got[key], dbws["ref"][key],
                                      err_msg=key)
