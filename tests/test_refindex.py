import numpy as np

from kcftools_tpu.engine.encode import canonicalize, pack_kmers, str_to_kmer
from kcftools_tpu.engine.refindex import RefKmerIndex
from kcftools_tpu.io.fasta import FastaIndex
from kcftools_tpu.native import gather_counts, merge_counts

from .gen import random_seq, write_fasta
from .oracle import canonical, window_kmers


def test_refindex_build_and_cache(tmp_path, rng):
    k = 11
    chr1 = random_seq(rng, 1500, n_prob=0.01)
    chr2 = random_seq(rng, 900)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, [("c1", chr1), ("c2", chr2)])
    index = FastaIndex(fa)

    ridx = RefKmerIndex.load_or_build(fa, index, k)
    # kmers sorted unique
    assert (np.diff(ridx.kmers.astype(np.int64)) > 0).all()
    # positions map back to the right canonical kmer
    for chrom, seq in (("c1", chr1), ("c2", chr2)):
        ri = ridx.chrom_r_idx[chrom]
        assert len(ri) == len(seq) - k + 1
        for i in range(0, len(ri), 97):
            sub = seq[i : i + k].upper()
            if all(c in "ACGT" for c in sub):
                assert ridx.kmers[ri[i]] == str_to_kmer(canonical(sub))
            else:
                assert ri[i] == -1

    # cache round-trip
    ridx2 = RefKmerIndex.load_or_build(fa, index, k)
    np.testing.assert_array_equal(ridx2.kmers, ridx.kmers)
    for chrom in ("c1", "c2"):
        np.testing.assert_array_equal(
            ridx2.chrom_r_idx[chrom], ridx.chrom_r_idx[chrom]
        )


def test_merge_counts_native_vs_numpy(rng):
    ref = np.unique(rng.integers(0, 1 << 40, size=5000, dtype=np.uint64))
    db = np.unique(rng.integers(0, 1 << 40, size=4000, dtype=np.uint64))
    counts = rng.integers(1, 100, size=db.size).astype(np.uint32)
    got = merge_counts(ref, db, counts)
    # dict oracle
    table = dict(zip(db.tolist(), counts.tolist()))
    exp = np.array([table.get(int(r), 0) for r in ref], np.uint32)
    np.testing.assert_array_equal(got, exp)


def test_gather_counts(rng):
    table = rng.integers(0, 1000, size=500).astype(np.uint32)
    idx = rng.integers(-1, 500, size=2000).astype(np.int32)
    got = gather_counts(table, idx)
    exp = np.where(idx >= 0, table[np.maximum(idx, 0)], 0)
    np.testing.assert_array_equal(got, exp)


def test_lean_build_matches_eager(tmp_path, monkeypatch):
    """The multi-Gbp lean build must produce the identical index."""
    import numpy as np

    from kcftools_tpu.engine.refindex import RefKmerIndex
    from kcftools_tpu.io.fasta import FastaIndex

    rng = np.random.default_rng(5)
    fa = tmp_path / "r.fa"
    with open(fa, "w") as fh:
        for name in ("cA", "cB", "cC"):
            s = "".join("ACGT"[b] for b in rng.integers(0, 4, 5000))
            # inject an N run to exercise invalid positions
            s = s[:1000] + "N" * 40 + s[1040:]
            fh.write(f">{name}\n{s}\n")
    index = FastaIndex(str(fa))
    eager = RefKmerIndex.build(index, 31)
    monkeypatch.setenv("KCFTOOLS_REFIDX_LEAN_MIN", "1")
    lean = RefKmerIndex.build(index, 31)
    assert np.array_equal(eager.kmers, lean.kmers)
    assert eager.chrom_names == lean.chrom_names
    for n in eager.chrom_names:
        assert np.array_equal(eager.chrom_r_idx[n], lean.chrom_r_idx[n]), n
