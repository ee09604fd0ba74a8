"""Sharded scorer must agree exactly with the single-device scorer on an
8-device CPU mesh for every (data, table) factorization."""

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


@pytest.mark.parametrize("data,table", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single(rng, data, table):
    k = 31
    genome = random_seq(rng, 6000)
    sample = mutate(rng, genome, snp_rate=0.01, del_rate=0.001)
    db = count_db([sample], k)
    kmers = np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    counts = np.array(list(db.values()), dtype=np.uint32)
    tbl = build_table(kmers, counts, k)

    windows = [genome[i : i + 500] for i in range(0, 5400, 470)]
    pad = max(len(w) for w in windows) + PAD_MARGIN
    codes, valids = zip(*[codes_from_str(w) for w in windows])
    bcodes, bvalid, wlen = pad_batch_varlen(list(codes), list(valids), pad)

    ref = WindowScorer(tbl).score_batch(bcodes, bvalid, wlen)

    mesh = make_mesh(data=data, table=table)
    sharded = ShardedWindowScorer(tbl, mesh)
    got = sharded.score_batch(bcodes, bvalid, wlen)

    for key in ref:
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)
