"""findIBS: label consecutive windows with score >= cutoff (or < cutoff
with --var) into numbered IBS blocks (reference: Plugins/FindIBS.java).

Replication notes:

* The reference iterates chromosomes via java.util.HashMap keySet
  (FindIBS.java:124,168), so both the output window order and the block
  numbering follow Java's hash-bucket order - emulated here via
  utils.jhash (falls back to input order if the emulation would diverge).
* With a stepped input KCF, --min is overridden to windowSize/stepSize
  (FindIBS.java:81-84).
* A new block starts when numNA > min (strict) or the chromosome changed;
  block numbers continue across chromosomes; the NA counter resets per
  chromosome (FindIBS.java:118-161).
* The block sweep itself is vectorized per (sample, chromosome): block
  increments are a cumulative sum over gap/chrom-change conditions.
"""

import numpy as np

from ..io.kcf import KCFReader, KCFWriter
from ..utils import javafmt, jhash
from ..utils.logger import Logger
from ._common import get_command_line

_CLASS = "FindIBS"


def add_parser(subparsers):
    p = subparsers.add_parser("findIBS", help="Find IBS windows in a KCF file")
    p.add_argument("-i", "--input", required=True, help="Input KCF file name")
    p.add_argument("-o", "--output", required=True, help="Output KCF file name")
    p.add_argument(
        "--var",
        action="store_true",
        help="Detect Variable Regions instead of IBS",
    )
    p.add_argument(
        "--min",
        dest="min_consecutive",
        type=int,
        default=4,
        help="Minimum number of consecutive windows",
    )
    p.add_argument("--score", type=float, default=95.0, help="Score cut-off")
    p.add_argument("--summary", action="store_true", help="Write summary tsv file")
    p.add_argument("--bed", action="store_true", help="Write bed file")
    p.set_defaults(func=run)
    return p


def run(args):
    out_file = args.output
    if not out_file.endswith(".kcf"):
        out_file += ".kcf"

    reader = KCFReader(args.input)
    header = reader.header
    min_consecutive = args.min_consecutive
    if header.step_size > 0:
        min_consecutive = header.window_size // header.step_size
        Logger.warning(
            _CLASS,
            "Input KCF file is created with step size. Hence we are using the "
            f"--min = windowSize/stepSize [{min_consecutive}]",
        )

    block = reader.read_all()
    n = len(block)
    s = block.n_samples
    # score cutoff: the reference compares double score against a float
    # cutoff, which widens the float32 to double
    cutoff = float(np.float32(args.score))

    file_chrom_order = list(dict.fromkeys(block.seq_names))
    try:
        chrom_order = jhash.hashmap_iteration_order(file_chrom_order)
        chrom_order = jhash.hashmap_iteration_order(chrom_order)
    except RuntimeError:
        Logger.warning(
            _CLASS, "HashMap order emulation unavailable; using input order"
        )
        chrom_order = file_chrom_order

    names = np.array(block.seq_names, dtype=object)
    chrom_rows = {c: np.flatnonzero(names == c) for c in file_chrom_order}

    is_ibs = (
        (block.score < cutoff) if args.var else (block.score >= cutoff)
    )  # (S, N)

    block.ibs[:] = -1
    for j in range(s):
        block_num = 0
        first_found = False
        for chrom in chrom_order:
            rows = chrom_rows[chrom]
            pos = np.flatnonzero(is_ibs[j, rows])
            if pos.size == 0:
                continue
            # numNA before each IBS window (resets at chromosome start)
            gaps = np.empty(pos.size, np.int64)
            gaps[0] = pos[0]
            gaps[1:] = np.diff(pos) - 1
            inc = gaps > min_consecutive
            # The first IBS of a chromosome: the reference increments when
            # blockChrom differs, which holds whenever an earlier
            # chromosome already produced a block. The global first IBS
            # never increments (it just sets blockNum = 1).
            inc[0] = first_found
            labels = (block_num if first_found else 1) + np.cumsum(
                inc.astype(np.int64)
            )
            block.ibs[j, rows[pos]] = labels
            block_num = int(labels[-1])
            first_found = True

    # output windows in chrom_order, each chromosome in file order
    order = np.concatenate([chrom_rows[c] for c in chrom_order]).astype(np.int64)
    out_block = block.select(order)

    header.is_ibs = True
    header.add_command_line(get_command_line())
    with KCFWriter(out_file) as writer:
        writer.write_header(header)
        writer.write_block(out_block)

    if args.summary:
        _write_summary(args, out_file, block, header, chrom_order, chrom_rows)


def _write_summary(args, out_file, block, header, chrom_order, chrom_rows):
    f2 = javafmt.f2
    summary_path = out_file[: -len(".kcf")] + ".summary.tsv"
    with open(summary_path, "w") as sw:
        sw.write(
            "Block\tSample\tChromosome\tStart\tEnd\tLength\tTotalBlocks\t"
            "IBSBlocks\tIBSProportion\tMeanScore\n"
        )
        for j, sample in enumerate(block.samples):
            blocks = {}  # block id -> list of window row indices (insertion order)
            for chrom in chrom_order:
                na_buf = []  # reference resets the NA buffer per chromosome
                for row in chrom_rows[chrom]:
                    v = int(block.ibs[j, row])
                    if v == -1:
                        na_buf.append(row)
                    else:
                        if v in blocks:
                            blocks[v].extend(na_buf)
                            blocks[v].append(row)
                        else:
                            blocks[v] = [row]
                        na_buf = []

            if args.bed:
                bed_path = out_file[: -len(".kcf")] + f".{sample}.bed"
                with open(bed_path, "w") as bw:
                    for rows in blocks.values():
                        if rows:
                            bw.write(
                                f"{block.seq_names[rows[0]]}\t"
                                f"{block.start[rows[0]]}\t{block.end[rows[-1]]}\n"
                            )

            for v, rows in blocks.items():
                if not rows:
                    continue
                total_blocks = len(rows)
                ibs_blocks = int((block.ibs[j, rows] != -1).sum())
                # Java: float accumulator += double score (adds in double,
                # narrows to float32 every step), then float32 division
                acc = np.float32(0.0)
                for r in rows:
                    acc = np.float32(float(acc) + float(block.score[j, r]))
                mean_score = acc / np.float32(total_blocks)
                ibs_prop = np.float32(ibs_blocks) / np.float32(total_blocks)
                start = block.start[rows[0]]
                end = block.end[rows[-1]]
                sw.write(
                    f"{v}\t{sample}\t{block.seq_names[rows[0]]}\t{start}\t{end}\t"
                    f"{end - start}\t{total_blocks}\t{ibs_blocks}\t"
                    f"{f2(float(ibs_prop))}\t{f2(float(mean_score))}\n"
                )
