"""compareIBS across the full k envelope (narrow / wide / multi-limb).

The reference's plugin (disabled upstream: Plugins/CompareIBS.java,
registry line commented at KCFTOOLS.java:23) counts, for every block
pair of a shared sample, the unique k-mers common to both block
sequences and how many of those appear in the KMC database - queried
in FORWARD form (CompareIBS.java:143-147). A string-kmer oracle checks
both counts here at k = 21, 41 and 75, covering all three key-width
tiers (an earlier revision only supported k <= 32).
"""

import argparse

import numpy as np
import pytest

from kcftools_tpu.io.kmc import write_kmc_db
from kcftools_tpu.plugins.compare_ibs import run as compare_run

BASES = "ACGT"


def _write_fasta(path, seqs):
    with open(path, "w") as fh:
        for name, s in seqs.items():
            fh.write(f">{name}\n{s}\n")


def _write_summary(path, rows):
    with open(path, "w") as fh:
        fh.write("Block\tSample\tChrom\tStart\tEnd\tLength\tTotalBlocks\t"
                 "IBSBlocks\tIBSProportion\tMeanScore\n")
        for i, (sample, chrom, start, end) in enumerate(rows):
            fh.write(f"{i}\t{sample}\t{chrom}\t{start}\t{end}\t"
                     f"{end - start}\t1\t1\t1.0\t99.0\n")


def _kmer_strings(seq, k):
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


def _pack_str(s):
    """Big-endian byte record of one k-mer string (encode_mlimb layout)."""
    k = len(s)
    nb = (k + 3) // 4
    v = 0
    for ch in s:
        v = (v << 2) | BASES.index(ch)
    return v.to_bytes(nb, "big")


@pytest.mark.parametrize("k", [21, 41, 75])
def test_compare_ibs_all_widths(tmp_path, k):
    rng = np.random.default_rng(100 + k)
    seqs = {
        "c1": "".join(BASES[b] for b in rng.integers(0, 4, 600)),
        "c2": "".join(BASES[b] for b in rng.integers(0, 4, 600)),
    }
    # ref two shares c1's middle so block pairs have real overlap
    seqs2 = {
        "d1": seqs["c1"][100:500]
        + "".join(BASES[b] for b in rng.integers(0, 4, 200)),
    }
    fa1 = tmp_path / "ref1.fa"
    fa2 = tmp_path / "ref2.fa"
    _write_fasta(fa1, seqs)
    _write_fasta(fa2, seqs2)

    # database: all k-mers of c1 plus noise sequence, forward form
    db_seq = seqs["c1"] + "".join(BASES[b] for b in rng.integers(0, 4, 300))
    db_strs = sorted(set(_kmer_strings(db_seq, k)))
    keys = np.array([_pack_str(s) for s in db_strs], dtype=f"S{(k + 3) // 4}")
    counts = np.ones(len(db_strs), np.uint32)
    db_prefix = str(tmp_path / "db")
    write_kmc_db(db_prefix, keys, counts, k, both_strands=False)

    sum1 = tmp_path / "one.tsv"
    sum2 = tmp_path / "two.tsv"
    blocks1 = [("s1", "c1", 0, 300), ("s1", "c2", 50, 350)]
    blocks2 = [("s1", "d1", 0, 400), ("s1", "d1", 200, 600)]
    _write_summary(sum1, blocks1)
    _write_summary(sum2, blocks2)

    out = tmp_path / "cmp.tsv"
    compare_run(argparse.Namespace(
        refOne=str(fa1), refTwo=str(fa2), kcfOne=str(sum1),
        kcfTwo=str(sum2), kmc=db_prefix, output=str(out), threads=2,
    ))

    db_set = set(db_strs)
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert len(rows) == len(blocks1) * len(blocks2)
    i = 0
    for _s, chrom1, start1, end1 in blocks1:
        ks1 = _kmer_strings(seqs[chrom1][start1:end1], k)
        for _s2, chrom2, start2, end2 in blocks2:
            ks2 = _kmer_strings(seqs2[chrom2][start2:end2], k)
            common = set(ks1) & set(ks2)
            exp = [chrom1, str(start1), str(end1),
                   chrom2, str(start2), str(end2),
                   str(len(ks1)), str(len(ks2)), str(len(common)),
                   str(len(common & db_set))]
            assert rows[i] == exp, f"row {i}"
            i += 1
