#!/usr/bin/env python
"""Simulate introgressions for end-to-end validation of the IBS pipeline.

Generates a recipient genome, a donor genome (diverged by SNPs/indels),
and sample genomes carrying known donor segments ("introgressions"),
then writes FASTAs plus a ground-truth BED of the introgressed regions.
Equivalent in purpose to the reference's utils/simulate_introgressions.py
(reference repo), reimplemented for this package's test/gen toolkit.

Usage:
  python utils/simulate_introgressions.py -o outdir [-n 2] [-l 1000000]
      [-c 3] [--divergence 0.02] [--segments 4] [--seg-len 50000]
Then:
  kcftools count -i outdir/sample_0.fa -o outdir/sample_0 -k 31
  kcftools getVariations -r outdir/recipient.fa -k outdir/sample_0 \
      -o outdir/sample_0.kcf -s sample_0 -f window -w 50000
  kcftools findIBS -i outdir/sample_0.kcf -o outdir/sample_0.ibs --summary
"""

import argparse
import os
import sys

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng, n):
    return bytes(_BASES[rng.integers(0, 4, size=n)]).decode()


def mutate(rng, seq, snp_rate, indel_rate=0.0):
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < indel_rate:
            i += int(rng.integers(1, 4))
            continue
        c = seq[i]
        if rng.random() < snp_rate:
            c = "ACGT"[(("ACGT".index(c)) + int(rng.integers(1, 4))) % 4]
        out.append(c)
        i += 1
    return "".join(out)


def write_fasta(path, records, width=60):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("-n", "--samples", type=int, default=2)
    ap.add_argument("-l", "--length", type=int, default=1_000_000)
    ap.add_argument("-c", "--chromosomes", type=int, default=2)
    ap.add_argument("--divergence", type=float, default=0.02)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--seg-len", type=int, default=50_000)
    ap.add_argument("--noise", type=float, default=0.0005,
                    help="background SNP rate in samples")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    chroms = [f"chr{i + 1}" for i in range(args.chromosomes)]
    recipient = {c: random_seq(rng, args.length) for c in chroms}
    donor = {c: mutate(rng, recipient[c], args.divergence) for c in chroms}
    write_fasta(
        os.path.join(args.outdir, "recipient.fa"),
        [(c, recipient[c]) for c in chroms],
    )
    write_fasta(
        os.path.join(args.outdir, "donor.fa"), [(c, donor[c]) for c in chroms]
    )

    truth = open(os.path.join(args.outdir, "truth.bed"), "w")
    for s in range(args.samples):
        sample = {}
        for c in chroms:
            seq = list(recipient[c])
            for _seg in range(args.segments):
                start = int(rng.integers(0, max(1, args.length - args.seg_len)))
                end = min(start + args.seg_len, len(donor[c]))
                seq[start:end] = donor[c][start:end]
                truth.write(f"{c}\t{start}\t{end}\tsample_{s}\n")
            sample[c] = mutate(rng, "".join(seq), args.noise)
        write_fasta(
            os.path.join(args.outdir, f"sample_{s}.fa"),
            [(c, sample[c]) for c in chroms],
        )
    truth.close()
    print(f"wrote recipient/donor/{args.samples} samples + truth.bed to {args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
