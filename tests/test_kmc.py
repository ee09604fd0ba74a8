import numpy as np

from kcftools_tpu.engine.encode import str_to_kmer
from kcftools_tpu.io.kmc import KMCReader, kmer_signatures, write_kmc_db

from .gen import db_from_seqs, random_seq


def test_roundtrip(tmp_path, rng):
    k = 31
    n = 5000
    kmers = np.unique(
        rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
        & np.uint64((1 << (2 * k)) - 1)
    )
    counts = rng.integers(1, 1000, size=kmers.size, dtype=np.uint64)
    prefix = str(tmp_path / "db")
    write_kmc_db(prefix, kmers, counts, k, sig_len=9)
    r = KMCReader(prefix)
    assert r.kmer_length == k
    assert r.total_kmers == kmers.size
    assert r.both_strands
    # reader returns records sorted by (signature bin, kmer); compare sets
    order = np.argsort(r.kmers)
    korder = np.argsort(kmers)
    np.testing.assert_array_equal(r.kmers[order], kmers[korder])
    np.testing.assert_array_equal(r.counts[order], counts[korder])


def test_roundtrip_small_k(tmp_path, rng):
    k = 13
    kmers = np.unique(rng.integers(0, 1 << (2 * k), size=300, dtype=np.uint64))
    counts = np.full(kmers.size, 7, dtype=np.uint64)
    prefix = str(tmp_path / "db13")
    write_kmc_db(prefix, kmers, counts, k, sig_len=9)
    r = KMCReader(prefix)
    np.testing.assert_array_equal(np.sort(r.kmers), kmers)
    assert (r.counts == 7).all()


def test_db_from_seqs_counts(tmp_path, rng):
    k = 15
    seq = random_seq(rng, 2000)
    prefix = str(tmp_path / "seqdb")
    db = db_from_seqs(prefix, [seq], k)
    r = KMCReader(prefix)
    assert r.total_kmers == len(db)
    got = {int(v): int(c) for v, c in zip(r.kmers, r.counts)}
    for s, c in db.items():
        assert got[str_to_kmer(s)] == c


def test_signatures_monotone_properties():
    k, m = 21, 9
    kmers = np.array([str_to_kmer("A" * 21), str_to_kmer("ACGT" * 5 + "A")], np.uint64)
    sigs = kmer_signatures(kmers, k, m)
    # poly-A has only disallowed m-mers -> sentinel
    assert sigs[0] == (1 << (2 * m))
    assert sigs[1] < (1 << (2 * m))


def test_slab_streamed_decode(tmp_path, rng, monkeypatch):
    """Multi-slab ingest must equal whole-file decode, including slabs
    that split bins at arbitrary offsets."""
    from kcftools_tpu.io import kmc as kmc_mod

    k = 31
    kmers = np.unique(rng.integers(0, 1 << 62, size=15000, dtype=np.uint64))
    counts = rng.integers(1, 500, size=kmers.size, dtype=np.uint64)
    prefix = str(tmp_path / "slab")
    write_kmc_db(prefix, kmers, counts, k, sig_len=9)
    whole = KMCReader(prefix)
    monkeypatch.setattr(kmc_mod.KMCReader, "_SLAB_RECORDS", 611)
    slabbed = KMCReader(prefix)
    np.testing.assert_array_equal(slabbed.kmers, whole.kmers)
    np.testing.assert_array_equal(slabbed.counts, whole.counts)


def test_writer_big_sort_path_matches_lexsort(tmp_path, monkeypatch):
    """The native composite-radix bin sort used for multi-Gbp writes
    must emit byte-identical files to the np.lexsort path."""
    from kcftools_tpu.io import kmc as kmcmod

    rng = np.random.default_rng(11)
    k = 31
    keys = np.unique(rng.integers(0, 1 << (2 * k), 60000, dtype=np.uint64))
    counts = rng.integers(1, 300, keys.shape[0], dtype=np.uint32)
    a = tmp_path / "a"
    b = tmp_path / "b"
    kmcmod.write_kmc_db(str(a), keys, counts, k, counter_size=2)
    monkeypatch.setattr(kmcmod, "_BIG_SORT_MIN", 1)
    kmcmod.write_kmc_db(str(b), keys, counts, k, counter_size=2)
    for suf in (".kmc_pre", ".kmc_suf"):
        assert (a.parent / (a.name + suf)).read_bytes() == (
            b.parent / (b.name + suf)
        ).read_bytes(), suf
