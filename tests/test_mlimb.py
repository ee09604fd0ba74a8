"""k > 64 (byte-record) path: encoding, KMC round trip, and e2e
getVariations at k=75 verified against the string oracle (the VERDICT
r1 envelope gap; reference supports arbitrary k via long[] arrays,
Data/Kmer.java:208-338)."""

import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.engine.encode_mlimb import (
    canonical_kmer_bytes,
    merge_counts_u8_bytes,
    n_bytes,
    pack_kmer_bytes,
)
from kcftools_tpu.io.kcf import KCFReader
from kcftools_tpu.io.kmc import KMCReader, write_kmc_db

from .gen import db_from_seqs, mutate, random_seq, str_key_bytes, write_fasta
from .oracle import canonical, compute_score, process_window

K = 75
WIN = 500


def _codes(seq):
    lut = {c: i for i, c in enumerate("ACGT")}
    codes = np.array([lut.get(c, 0) for c in seq], np.uint8)
    valid = np.array([c in "ACGT" for c in seq], bool)
    return codes, valid


def test_pack_and_canonical_vs_oracle():
    rng = np.random.default_rng(7)
    seq = random_seq(rng, 3000, n_prob=0.01)
    codes, valid = _codes(seq)
    keys, kvalid = canonical_kmer_bytes(codes, valid, K)
    nb = n_bytes(K)
    for p in rng.integers(0, len(seq) - K + 1, 200):
        sub = seq[p : p + K]
        if "N" in sub:
            assert not kvalid[p]
            continue
        assert kvalid[p]
        got = keys[p] + b"\x00" * (nb - len(keys[p]))
        assert got == str_key_bytes(canonical(sub))


def test_order_matches_string_order():
    """S{nb} sort order must equal base-lexicographic k-mer order."""
    rng = np.random.default_rng(8)
    seq = random_seq(rng, 2000)
    codes, valid = _codes(seq)
    keys, kvalid = pack_kmer_bytes(codes, valid, K)
    kept = keys[kvalid]
    strs = [seq[p : p + K] for p in range(len(seq) - K + 1) if kvalid[p]]
    order_b = np.argsort(kept)
    order_s = np.argsort(np.array(strs))
    assert [strs[i] for i in order_b] == [strs[i] for i in order_s]


def test_kmc_roundtrip_k75(tmp_path):
    rng = np.random.default_rng(9)
    seq = random_seq(rng, 4000)
    db = db_from_seqs(str(tmp_path / "db75"), [seq], K)
    r = KMCReader(str(tmp_path / "db75"))
    assert r.kmer_length == K
    assert r.mlimb and not r.wide
    assert r.kmers_bytes.shape[0] == len(db)
    got = {
        bytes(k) + b"\x00" * (n_bytes(K) - len(bytes(k))): int(c)
        for k, c in zip(r.kmers_bytes, r.counts)
    }
    exp = {str_key_bytes(s): c for s, c in db.items()}
    assert got == exp


def test_merge_counts_bytes_exceptions():
    rng = np.random.default_rng(10)
    nb = n_bytes(K)
    raw = rng.integers(0, 256, (500, nb)).astype(np.uint8)
    ref = np.unique(raw.view(f"S{nb}").ravel())
    db = ref[rng.random(ref.size) < 0.6]
    dbc = rng.integers(1, 1000, db.size).astype(np.uint32)
    u8, ei, ev = merge_counts_u8_bytes(ref, db, dbc)
    m = {bytes(x): int(c) for x, c in zip(db, dbc)}
    for i in range(ref.size):
        exp = m.get(bytes(ref[i]), 0)
        got = int(u8[i])
        if got == 255:
            j = np.searchsorted(ei, i)
            assert j < ei.size and ei[j] == i
            got = int(ev[j])
        assert got == exp


@pytest.fixture(scope="module")
def workspace75(tmp_path_factory):
    rng = np.random.default_rng(11)
    tmp = tmp_path_factory.mktemp("mlimb")
    chr1 = random_seq(rng, 2600, n_prob=0.004)
    chr2 = random_seq(rng, 1800, n_prob=0.004)
    ref_path = str(tmp / "ref.fa")
    write_fasta(ref_path, [("chr1", chr1), ("chr2", chr2)])
    seqs = [mutate(rng, chr1, 0.01, 0.002), mutate(rng, chr2, 0.01, 0.002)]
    db = db_from_seqs(str(tmp / "db_m1"), seqs, K)
    kcf = str(tmp / "m1.kcf")
    rc = cli_main(
        [
            "getVariations",
            "-r", ref_path, "-k", str(tmp / "db_m1"), "-o", kcf,
            "-s", "m1", "-f", "window", "-w", str(WIN),
        ]
    )
    assert rc == 0
    return {"ref": {"chr1": chr1, "chr2": chr2}, "db": db, "kcf": kcf}


def test_get_variations_k75_vs_oracle(workspace75):
    block = KCFReader(workspace75["kcf"]).read_all()
    header = KCFReader(workspace75["kcf"]).header
    assert header.kmer_size == K
    from .test_plugins_e2e import _oracle_windows

    i = 0
    for chrom in ("chr1", "chr2"):
        seq = workspace75["ref"][chrom]
        for start, end in _oracle_windows(seq, K, WIN):
            assert block.seq_names[i] == chrom
            assert block.start[i] == start
            assert block.end[i] == end
            exp = process_window(seq[start:end], K, workspace75["db"])
            assert block.total_kmers[i] == exp["total"]
            assert block.eff_length[i] == exp["eff_length"]
            assert block.ob[0, i] == exp["observed"]
            assert block.va[0, i] == exp["variations"]
            assert block.inner[0, i] == exp["inner"]
            assert block.left[0, i] == exp["left"]
            assert block.right[0, i] == exp["right"]
            sc = compute_score(
                exp["observed"], exp["total"], exp["eff_length"],
                exp["inner"], exp["left"] + exp["right"], (0.3, 0.3, 0.4),
            )
            assert abs(block.score[0, i] - sc) < 1e-12
            i += 1
    assert i == len(block)
