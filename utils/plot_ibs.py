#!/usr/bin/env python
"""Chromosome-wise IBS block plot from findIBS --summary output.

Python analog of the reference's utils/plotIBS.R (capability parity):
each chromosome is a horizontal track scaled to its length; every IBS
block longer than --minlen is drawn as a rectangle in its sample's (or
group's) color.

Usage:
  python utils/plot_ibs.py -c chrinfo.tsv -i a.summary.tsv b.summary.tsv \
      -o ibs.pdf [-g groups.tsv] [-m 1000000]

chrinfo.tsv: <chrom>TAB<length> rows (extra columns ignored).
groups.tsv:  <sample>TAB<group> rows (optional; samples default to
             their own group).
"""

import argparse
import csv
import sys
from collections import OrderedDict

# Okabe-Ito: the published colorblind-safe categorical set, assigned in
# fixed order (never cycled); >8 groups fold into "Other" (gray).
PALETTE = ["#0072B2", "#E69F00", "#009E73", "#CC79A7",
           "#56B4E9", "#D55E00", "#F0E442", "#000000"]
OTHER = "#999999"


def read_chrinfo(path):
    out = OrderedDict()
    with open(path) as fh:
        for row in csv.reader(fh, delimiter="\t"):
            if not row or row[0].startswith("#"):
                continue
            out[row[0]] = int(row[1])
    return out


def read_summaries(paths, minlen):
    rows = []
    for path in paths:
        with open(path) as fh:
            rd = csv.DictReader(fh, delimiter="\t")
            for r in rd:
                length = int(r["Length"])
                if length < minlen:
                    continue
                rows.append(
                    (r["Sample"], r["Chromosome"], int(r["Start"]),
                     int(r["End"]))
                )
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-c", "--chrinfo", required=True)
    ap.add_argument("-i", "--ibs", nargs="+", required=True,
                    help="findIBS --summary TSV file(s)")
    ap.add_argument("-o", "--output", required=True, help="Output PDF/PNG")
    ap.add_argument("-g", "--groups", default=None,
                    help="sample TAB group TSV")
    ap.add_argument("-m", "--minlen", type=float, default=1e6,
                    help="Minimum block length to draw [1e6]")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    chrinfo = read_chrinfo(args.chrinfo)
    rows = read_summaries(args.ibs, args.minlen)
    groups = {}
    if args.groups:
        with open(args.groups) as fh:
            for r in csv.reader(fh, delimiter="\t"):
                if len(r) >= 2:
                    groups[r[0]] = r[1]
    samples = sorted({r[0] for r in rows})
    group_of = {s: groups.get(s, s) for s in samples}
    group_names = list(OrderedDict.fromkeys(group_of[s] for s in samples))
    color_of = {
        g: (PALETTE[i] if i < len(PALETTE) else OTHER)
        for i, g in enumerate(group_names)
    }

    n_chr = len(chrinfo)
    fig_h = max(2.5, 0.35 * n_chr * max(1, len(samples)) + 1.2)
    fig, ax = plt.subplots(figsize=(10, fig_h))
    ymax = 0
    yticks, ylabels = [], []
    for ci, (chrom, clen) in enumerate(chrinfo.items()):
        for si, sample in enumerate(samples):
            y = ci * (len(samples) + 1) + si
            ymax = max(ymax, y)
            # recessive track line
            ax.plot([0, clen], [y, y], color="#DDDDDD", lw=1, zorder=1)
            if si == len(samples) // 2:
                yticks.append(y)
                ylabels.append(chrom)
            for s, c, a, b in rows:
                if s == sample and c == chrom:
                    ax.add_patch(
                        Rectangle((a, y - 0.38), b - a, 0.76,
                                  facecolor=color_of[group_of[s]],
                                  edgecolor="none", zorder=2)
                    )
    ax.set_ylim(-1, ymax + 1)
    ax.invert_yaxis()
    ax.set_yticks(yticks)
    ax.set_yticklabels(ylabels)
    ax.set_xlabel("Position (bp)")
    ax.spines[["top", "right", "left"]].set_visible(False)
    handles = [
        plt.Line2D([], [], color=color_of[g], lw=6, label=g)
        for g in group_names
    ]
    if len(group_names) > 1:
        ax.legend(handles=handles, frameon=False, loc="upper right",
                  fontsize=8)
    ax.set_title("IBS blocks" + (f" (>= {args.minlen:.0f} bp)"))
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"wrote {args.output}: {len(rows)} blocks, "
          f"{len(samples)} samples, {n_chr} chromosomes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
