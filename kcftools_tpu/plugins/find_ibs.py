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
    """Vectorized block grouping. Key structural facts (matching the
    reference's buffer-and-flush logic, FindIBS.java:181-203): block ids
    are strictly increasing along the sample sweep and confined to one
    chromosome, so in scan order each block's member set is exactly the
    contiguous span from its first to its last non-NA window - interior
    NA windows attach, leading/trailing ones are discarded."""
    from ..native import f32_seq_group_mean

    f2 = javafmt.f2
    order_rows = np.concatenate(
        [chrom_rows[c] for c in chrom_order]
    ).astype(np.int64)
    starts_arr = block.start
    ends_arr = block.end

    summary_path = out_file[: -len(".kcf")] + ".summary.tsv"
    with open(summary_path, "w") as sw:
        sw.write(
            "Block\tSample\tChromosome\tStart\tEnd\tLength\tTotalBlocks\t"
            "IBSBlocks\tIBSProportion\tMeanScore\n"
        )
        for j, sample in enumerate(block.samples):
            v = block.ibs[j, order_rows]
            pos = np.flatnonzero(v != -1)
            if pos.size == 0:
                if args.bed:
                    open(out_file[: -len(".kcf")] + f".{sample}.bed", "w").close()
                continue
            ids = v[pos]
            run_start_idx = np.flatnonzero(
                np.concatenate(([True], ids[1:] != ids[:-1]))
            )
            run_starts = pos[run_start_idx]  # scan positions
            run_ends = pos[np.append(run_start_idx[1:] - 1, pos.size - 1)]
            block_ids = ids[run_start_idx]
            total_blocks = run_ends - run_starts + 1
            ibs_blocks = np.diff(np.append(run_start_idx, pos.size))

            first_rows = order_rows[run_starts]
            last_rows = order_rows[run_ends]

            if args.bed:
                bed_path = out_file[: -len(".kcf")] + f".{sample}.bed"
                with open(bed_path, "w") as bw:
                    for g in range(len(block_ids)):
                        bw.write(
                            f"{block.seq_names[first_rows[g]]}\t"
                            f"{starts_arr[first_rows[g]]}\t{ends_arr[last_rows[g]]}\n"
                        )

            # member scores, flat, with group boundaries
            member_scan = np.concatenate(
                [np.arange(s, e + 1) for s, e in zip(run_starts, run_ends)]
            )
            group_off = np.zeros(len(block_ids) + 1, np.int64)
            np.cumsum(total_blocks, out=group_off[1:])
            scores_flat = block.score[j, order_rows[member_scan]]
            mean_scores = f32_seq_group_mean(scores_flat, group_off)
            props = ibs_blocks.astype(np.float32) / total_blocks.astype(np.float32)

            for g in range(len(block_ids)):
                fr, lr = first_rows[g], last_rows[g]
                start = starts_arr[fr]
                end = ends_arr[lr]
                sw.write(
                    f"{block_ids[g]}\t{sample}\t{block.seq_names[fr]}\t{start}\t"
                    f"{end}\t{end - start}\t{total_blocks[g]}\t{ibs_blocks[g]}\t"
                    f"{f2(float(props[g]))}\t{f2(float(mean_scores[g]))}\n"
                )
