import numpy as np

from kcftools_tpu.engine.encode import str_to_kmer
from kcftools_tpu.engine.hashtable import build_table
from kcftools_tpu.engine.pipeline import PAD_MARGIN, WindowScorer
from kcftools_tpu.engine.windows import pad_batch_varlen
from kcftools_tpu.io.fasta import codes_from_str

from .gen import mutate, random_seq
from .oracle import count_db, process_window


def _table_from_db(db, k, both_strands=True):
    kmers = np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    counts = np.array(list(db.values()), dtype=np.uint32)
    return build_table(kmers, counts, k, both_strands=both_strands)


def _score_windows(windows, db, k, min_count=1, both_strands=True):
    table = _table_from_db(db, k, both_strands)
    scorer = WindowScorer(table, min_count=min_count)
    pad = max(len(w) for w in windows) + PAD_MARGIN
    codes, valids = zip(*[codes_from_str(w) for w in windows])
    bcodes, bvalid, wlen = pad_batch_varlen(list(codes), list(valids), pad)
    return scorer.score_batch(bcodes, bvalid, wlen)


def _check_vs_oracle(windows, db, k, min_count=1, both_strands=True):
    res = _score_windows(windows, db, k, min_count, both_strands)
    for i, w in enumerate(windows):
        exp = process_window(w, k, db, min_count, both_strands)
        for key in ("total", "observed", "variations", "inner", "left", "right",
                    "eff_length"):
            assert res[key][i] == exp[key], (key, i, res[key][i], exp[key])
        assert int(res["count_sum"][i]) == exp["count_sum"], i


def test_pipeline_vs_oracle_random(rng):
    k = 31
    genome = random_seq(rng, 8000)
    sample = mutate(rng, genome, snp_rate=0.01, del_rate=0.002)
    db = count_db([sample], k)
    windows = [genome[i : i + 1000] for i in range(0, 7000, 970)]
    _check_vs_oracle(windows, db, k)


def test_pipeline_vs_oracle_with_n(rng):
    k = 21
    genome = random_seq(rng, 6000, n_prob=0.01)
    sample = mutate(rng, genome, snp_rate=0.02)
    db = count_db([sample], k)
    windows = [genome[i : i + 600] for i in range(0, 5400, 555)]
    _check_vs_oracle(windows, k=k, db=db)


def test_pipeline_edge_cases(rng):
    k = 11
    base = random_seq(rng, 400)
    db = count_db([base], k)
    windows = [
        base[:100],                       # perfect identity
        random_seq(rng, 100),             # likely nothing observed
        "N" * 50 + base[:60],             # leading Ns
        base[40:100] + "N" * 30,          # trailing Ns
        base[:30] + random_seq(rng, 25) + base[60:120],  # inner gap
        random_seq(rng, 30) + base[100:180],             # leading gap
        base[200:280] + random_seq(rng, 30),             # trailing gap
        "N" * 40,                        # no valid kmers at all
        base[:k],                        # single kmer window
    ]
    _check_vs_oracle(windows, db, k)


def test_pipeline_small_k16_boundary(rng):
    # k = 16 exercises n_lo == 0; k = 17 exercises n_lo == 1
    for k in (16, 17, 32):
        genome = random_seq(rng, 2000)
        sample = mutate(rng, genome, snp_rate=0.01)
        db = count_db([sample], k)
        windows = [genome[i : i + 300] for i in range(0, 1600, 290)]
        _check_vs_oracle(windows, db, k)


def test_pipeline_min_count(rng):
    k = 13
    genome = random_seq(rng, 1500)
    # duplicate genome so counts are >= 2 for shared kmers
    db = count_db([genome, genome, random_seq(rng, 800)], k)
    windows = [genome[i : i + 250] for i in range(0, 1200, 240)]
    _check_vs_oracle(windows, db, k, min_count=2)


def test_pipeline_single_strand(rng):
    k = 15
    genome = random_seq(rng, 1500)
    db = count_db([genome], k, both_strands=False)
    windows = [genome[i : i + 300] for i in range(0, 1100, 280)]
    _check_vs_oracle(windows, db, k, both_strands=False)
