"""The hybrid (host-join) and device (hash-table) engines must produce
byte-identical KCF output."""

import numpy as np

from kcftools_tpu.cli import main as cli_main

from .gen import db_from_seqs, mutate, random_seq, write_fasta


def _strip_volatile(text):
    return "\n".join(
        line
        for line in text.split("\n")
        if not line.startswith(("##date=", "##CMD="))
    )


def test_engines_byte_identical(tmp_path, rng):
    k = 21
    chr1 = random_seq(rng, 4000, n_prob=0.004)
    chr2 = random_seq(rng, 2500)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("c1", chr1), ("c2", chr2)])
    prefix = str(tmp_path / "db")
    db_from_seqs(prefix, [mutate(rng, chr1, 0.01, 0.002), mutate(rng, chr2, 0.03)], k)

    outs = {}
    for engine in ("hybrid", "device"):
        out = str(tmp_path / f"{engine}.kcf")
        rc = cli_main(
            ["getVariations", "-r", fa, "-k", prefix, "-o", out,
             "-s", "s1", "-f", "window", "-w", "500", "--engine", engine]
        )
        assert rc == 0
        outs[engine] = _strip_volatile(open(out).read())
    assert outs["hybrid"] == outs["device"]


def test_engines_agree_sliding(tmp_path, rng):
    k = 17
    chrom = random_seq(rng, 3000, n_prob=0.01)
    fa = str(tmp_path / "ref2.fa")
    write_fasta(fa, [("c1", chrom)])
    prefix = str(tmp_path / "db2")
    db_from_seqs(prefix, [mutate(rng, chrom, 0.02)], k)
    outs = {}
    for engine in ("hybrid", "device"):
        out = str(tmp_path / f"sl_{engine}.kcf")
        rc = cli_main(
            ["getVariations", "-r", fa, "-k", prefix, "-o", out,
             "-s", "sY", "-f", "window", "-w", "400", "-p", "150",
             "--engine", engine, "-c", "2"]
        )
        assert rc == 0
        outs[engine] = _strip_volatile(open(out).read())
    assert outs["hybrid"] == outs["device"]
