"""kcftools-tpu command line driver.

Subcommand registry mirrors the reference (KCFTOOLS.java:16-28):
getVariations, cohort, findIBS, splitKCF, getAttributes, kcf2tsv,
increaseWindow, kcf2plink, scoreRecalc, kcf2gt - plus the new ``count``
(built-in k-mer counter; the reference depends on external KMC3).
"""

import argparse
import sys
import time

from . import __version__
from .utils.logger import KcfError, Logger


def build_parser():
    parser = argparse.ArgumentParser(
        prog="kcftools",
        description="TPU-native k-mer based genomic variation screening",
    )
    parser.add_argument("--version", action="version", version=__version__)
    subparsers = parser.add_subparsers(dest="command", required=True)
    from .plugins import PLUGINS

    for plugin in PLUGINS:
        plugin.add_parser(subparsers)
    return parser


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = build_parser()
    args = parser.parse_args(argv)
    start = time.time()
    try:
        args.func(args)
    except KcfError:
        return 1
    Logger.info("KCFTOOLS", f"Total execution time: {time.time() - start:.2f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
