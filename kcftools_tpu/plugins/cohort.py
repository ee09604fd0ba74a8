"""cohort: merge N single-sample KCFs into one multi-sample KCF.

Windows are matched by windowId against the first file; headers must be
compatible (reference: Plugins/Cohort.java:71-119, KCFHeader.equals).
Output keeps file-0 window order.
"""

import numpy as np

from ..io.kcf import KCFReader, KCFWriter, WindowBlock
from ..utils.logger import Logger
from ._common import get_command_line

_CLASS = "Cohort"


def add_parser(subparsers):
    p = subparsers.add_parser("cohort", help="Create a cohort of samples kcf files")
    p.add_argument("-o", "--output", required=True, help="Output file name")
    p.add_argument(
        "-i", "--input", default=None, help="Comma-separated list of kcf files"
    )
    p.add_argument(
        "-l", "--list", dest="list_file", default=None, help="File with kcf paths"
    )
    p.set_defaults(func=run)
    return p


def run(args):
    if not args.input and not args.list_file:
        Logger.error(_CLASS, "No input files provided")
    if args.list_file:
        with open(args.list_file) as fh:
            in_files = [line.rstrip("\n") for line in fh if line.strip()]
    else:
        in_files = args.input.split(",")

    header = None
    base = None
    id_index = {}
    merged_arrays = []

    for i, path in enumerate(in_files):
        reader = KCFReader(path)
        if i == 0:
            header = reader.header
            base = reader.read_all()
            id_index = {wid: j for j, wid in enumerate(base.window_id)}
        else:
            tmp_header = reader.header
            header.check_compatible(tmp_header)
            for s in tmp_header.samples:
                if s in header.samples:
                    Logger.error(
                        _CLASS, f"Sample {s} already exists in window data"
                    )
            header.merge(tmp_header)
            blk = reader.read_all()
            try:
                pos = np.array([id_index[w] for w in blk.window_id], np.int64)
            except KeyError as e:
                Logger.error(
                    _CLASS, f"Windows mismatch found in sample: {path} at window: {e}"
                )
            merged_arrays.append((blk, pos))

    n = len(base)
    out = WindowBlock(n, header.samples)
    out.seq_names = base.seq_names
    out.window_id = base.window_id
    out.start = base.start
    out.end = base.end
    out.total_kmers = base.total_kmers
    out.eff_length = base.eff_length

    def _assign(dst_row_start, blk, pos):
        s = blk.n_samples
        rows = slice(dst_row_start, dst_row_start + s)
        for name in ("present", "ibs", "va", "ob", "inner", "left", "right", "kmer_count"):
            getattr(out, name)[rows][:, pos] = getattr(blk, name)
        if len(pos) < n:
            mask = np.ones(n, bool)
            mask[pos] = False
            out.present[rows][:, mask] = False
        return dst_row_start + s

    out.present[:] = False
    row = _assign(0, base, np.arange(n))
    for blk, pos in merged_arrays:
        row = _assign(row, blk, pos)

    out.finalize(header.weights)
    header.add_command_line(get_command_line())
    with KCFWriter(args.output) as writer:
        writer.write_header(header)
        writer.write_block(out)
