import numpy as np

from kcftools_tpu.engine.encode import (
    canonicalize,
    kmer_to_str,
    pack_kmers,
    revcomp64,
    split_hi_lo,
    join_hi_lo,
    str_to_kmer,
)
from kcftools_tpu.io.fasta import codes_from_str

from .oracle import canonical, revcomp, window_kmers


def test_str_roundtrip():
    s = "ACGTTGCAACGTTGCAACGTTGCAACGTTGC"  # k=31
    v = str_to_kmer(s)
    assert kmer_to_str(v, 31) == s


def test_revcomp64_matches_string(rng):
    for k in (5, 16, 17, 31, 32):
        for _ in range(50):
            s = "".join(rng.choice(list("ACGT"), size=k))
            v = np.array([str_to_kmer(s)], dtype=np.uint64)
            rc = revcomp64(v, k)[0]
            assert kmer_to_str(int(rc), k) == revcomp(s)


def test_canonicalize_matches_string(rng):
    for k in (11, 31):
        seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(100)]
        vals = np.array([str_to_kmer(s) for s in seqs], dtype=np.uint64)
        canon = canonicalize(vals, k)
        for s, c in zip(seqs, canon):
            assert kmer_to_str(int(c), k) == canonical(s)


def test_pack_kmers_with_n(rng):
    k = 7
    seq = "ACGTNNACGTACGTACGANACGTACG"
    codes, valid = codes_from_str(seq)
    kmers, kvalid = pack_kmers(codes, valid, k)
    expected = window_kmers(seq, k)
    got = [kmer_to_str(int(v), k) for v, ok in zip(kmers, kvalid) if ok]
    assert got == expected


def test_split_join_hi_lo(rng):
    for k in (9, 16, 17, 31, 32):
        vals = rng.integers(0, 1 << min(2 * k, 63), size=200, dtype=np.uint64)
        vals &= np.uint64((1 << (2 * k)) - 1) if k < 32 else np.uint64(0xFFFFFFFFFFFFFFFF)
        hi, lo = split_hi_lo(vals, k)
        back = join_hi_lo(hi, lo, k)
        np.testing.assert_array_equal(back, vals)
