"""FASTA index robustness: line widths, ragged tails, lowercase, IUPAC."""

import numpy as np
import pytest

from kcftools_tpu.io.fasta import FastaIndex, codes_from_str
from kcftools_tpu.utils.logger import KcfError

from .gen import random_seq


def _write(path, records, width):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name} some description\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


@pytest.mark.parametrize("width", [17, 60, 80, 1000])
def test_extraction_widths(tmp_path, rng, width):
    seq1 = random_seq(rng, 503)
    seq2 = random_seq(rng, 1001, n_prob=0.05)
    fa = str(tmp_path / f"w{width}.fa")
    _write(fa, [("a", seq1), ("b", seq2)], width)
    idx = FastaIndex(fa)
    assert idx.get_sequence_names() == ["a", "b"]
    assert idx.get_sequence_length("a") == 503
    assert idx.get_sequence("a") == seq1
    assert idx.get_sequence("b") == seq2
    # random subranges
    for _ in range(20):
        s = int(rng.integers(0, 900))
        ln = int(rng.integers(1, 100))
        ln = min(ln, 1001 - s)
        assert idx.get_sequence("b", s, ln) == seq2[s : s + ln]


def test_lowercase_and_iupac(tmp_path):
    seq = "acgtACGTnNrymkswbdhv"
    fa = str(tmp_path / "lc.fa")
    _write(fa, [("c", seq.upper())], 7)
    idx = FastaIndex(fa)
    codes, valid = idx.sequence_codes("c")
    assert valid[:8].all() and not valid[8:].any()
    codes2, valid2 = codes_from_str(seq)
    np.testing.assert_array_equal(codes[:8], codes2[:8])
    assert valid2[:8].all() and not valid2[8:].any()


def test_invalid_requests(tmp_path, rng):
    fa = str(tmp_path / "e.fa")
    _write(fa, [("x", random_seq(rng, 100))], 60)
    idx = FastaIndex(fa)
    with pytest.raises(KcfError):
        idx.get_sequence("nope")
    with pytest.raises(KcfError):
        idx.get_sequence("x", 90, 20)  # beyond end
    with pytest.raises(KcfError):
        idx.get_sequence("x", -1, 5)


def test_stale_index_regenerated(tmp_path, rng):
    import os
    import time

    seq = random_seq(rng, 200)
    fa = str(tmp_path / "s.fa")
    _write(fa, [("c", seq)], 60)
    idx = FastaIndex(fa)
    assert idx.get_sequence("c") == seq
    time.sleep(0.02)
    seq2 = random_seq(rng, 300)
    _write(fa, [("c", seq2)], 60)
    os.utime(fa)
    idx2 = FastaIndex(fa)
    assert idx2.get_sequence_length("c") == 300
    assert idx2.get_sequence("c") == seq2


def test_error_paths(tmp_path, rng):
    from kcftools_tpu.cli import main as cli_main

    from .gen import db_from_seqs, write_fasta

    k = 15
    seq = random_seq(rng, 800)
    ref = str(tmp_path / "r.fa")
    write_fasta(ref, [("c1", seq)])
    db = str(tmp_path / "d")
    db_from_seqs(db, [seq], k)

    # window mode without window size
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o",
                     str(tmp_path / "o.kcf"), "-s", "s", "-f", "window"]) == 1
    # invalid feature
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o",
                     str(tmp_path / "o.kcf"), "-s", "s", "-f", "bogus",
                     "-w", "100"]) == 1
    # gene mode without gtf
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o",
                     str(tmp_path / "o.kcf"), "-s", "s", "-f", "gene"]) == 1

    # produce a KCF, then try incompatible cohort
    kcf1 = str(tmp_path / "a.kcf")
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", kcf1,
                     "-s", "sa", "-f", "window", "-w", "200"]) == 0
    kcf2 = str(tmp_path / "b.kcf")
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", kcf2,
                     "-s", "sb", "-f", "window", "-w", "250"]) == 0
    assert cli_main(["cohort", "-o", str(tmp_path / "c.kcf"),
                     "-i", f"{kcf1},{kcf2}"]) == 1  # window size mismatch

    # increaseWindow on stepped input is rejected
    stepped = str(tmp_path / "st.kcf")
    assert cli_main(["getVariations", "-r", ref, "-k", db, "-o", stepped,
                     "-s", "ss", "-f", "window", "-w", "200", "-p", "100"]) == 0
    assert cli_main(["increaseWindow", "-i", stepped, "-o",
                     str(tmp_path / "big.kcf"), "-w", "400"]) == 1
    # shrinking is rejected
    assert cli_main(["increaseWindow", "-i", kcf1, "-o",
                     str(tmp_path / "small.kcf"), "-w", "100"]) == 1
    # kcf2gt score validation
    assert cli_main(["kcf2gt", "-i", kcf1, "-o", str(tmp_path / "g.tsv"),
                     "--score_a", "50", "--score_b", "60"]) == 1
