#!/usr/bin/env python
"""Per-sample score histograms from a KCF file, for picking IBS score
thresholds. Python analog of the reference's utils/scoreHistogram.R.

Usage:
  python utils/score_histogram.py -i cohort.kcf -o scores.pdf \
      [--bins 100] [--log] [--cutoff 95]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-i", "--input", required=True, help="KCF file")
    ap.add_argument("-o", "--output", required=True, help="Output PDF/PNG")
    ap.add_argument("--bins", type=int, default=100)
    ap.add_argument("--log", action="store_true", help="Log-scale counts")
    ap.add_argument("--cutoff", type=float, default=None,
                    help="Draw a reference line at this score")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from kcftools_tpu.io.kcf import KCFReader

    reader = KCFReader(args.input)
    samples = reader.header.samples
    scores = {s: [] for s in samples}
    for block in reader.batches():
        for j, s in enumerate(samples):
            scores[s].append(np.asarray(block.score[j]))
    scores = {s: np.concatenate(v) if v else np.empty(0) for s, v in
              scores.items()}

    n = len(samples)
    ncol = min(3, n)
    nrow = math.ceil(n / ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 2.6 * nrow),
                             squeeze=False, sharex=True)
    # magnitude per facet: one hue, identity carried by the facet title
    for i, s in enumerate(samples):
        ax = axes[i // ncol][i % ncol]
        ax.hist(scores[s], bins=args.bins, range=(0, 100),
                color="#0072B2", edgecolor="none")
        if args.log:
            ax.set_yscale("log")
        if args.cutoff is not None:
            ax.axvline(args.cutoff, color="#D55E00", lw=1.2, ls="--")
        ax.set_title(s, fontsize=9)
        ax.spines[["top", "right"]].set_visible(False)
    for j in range(n, nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    fig.supxlabel("Window identity score")
    fig.supylabel("Windows")
    fig.tight_layout()
    fig.savefig(args.output)
    print(f"wrote {args.output}: {n} samples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
