#!/usr/bin/env python
"""Convert a HapMap genotype file (single-nucleotide calls, SNPs only)
to the numeric genotype-table format kcf2gt emits. Python analog of the
reference's utils/hmp2gt.R.

Coding per marker with alleles "R/A":
  call == R -> 0, call == A -> 2, IUPAC het of {R,A} -> 1, else -> -1.

Usage: python utils/hmp2gt.py input.hmp.txt output.gt.tsv
"""

import sys

_IUPAC = {
    "R": "AG", "Y": "CT", "S": "CG", "W": "AT", "K": "GT", "M": "AC",
}


def code(call, ref, alt):
    if call == ref:
        return "0"
    if call == alt:
        return "2"
    pair = _IUPAC.get(call)
    if pair and ref in pair and alt in pair:
        return "1"
    return "-1"


def main(argv):
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    inp, outp = argv[1], argv[2]
    n = 0
    with open(inp) as fh, open(outp, "w") as out:
        header = fh.readline().rstrip("\n").split("\t")
        # HapMap: rs# alleles chrom pos strand ... (11 meta cols) samples
        samples = header[11:]
        out.write("ID\tCHR\tSTART\tEND\t" + "\t".join(samples) + "\n")
        for line in fh:
            f = line.rstrip("\n").split("\t")
            alleles = f[1].split("/")
            if len(alleles) != 2 or any(len(a) != 1 for a in alleles):
                continue  # SNPs only
            ref, alt = alleles
            pos = f[3]
            out.write(
                f"{f[0]}\t{f[2]}\t{pos}\t{pos}\t"
                + "\t".join(code(c.upper(), ref, alt) for c in f[11:])
                + "\n"
            )
            n += 1
    print(f"wrote {outp}: {n} SNPs x {len(samples)} samples")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
