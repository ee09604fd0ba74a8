"""Subcommand implementations.

Each module exposes ``add_parser(subparsers)`` and ``run(args)``.
Registry order mirrors the reference CLI (KCFTOOLS.java:16-28).
"""

from . import (
    get_variations,
    cohort,
    find_ibs,
    split_kcf,
    get_attributes,
    kcf2tsv,
    increase_window,
    kcf2plink,
    score_recalc,
    kcf2gt,
    compare_ibs,
    kcf2matrix,
    count,
)

PLUGINS = [
    get_variations,
    cohort,
    find_ibs,
    split_kcf,
    get_attributes,
    kcf2tsv,
    increase_window,
    kcf2plink,
    score_recalc,
    kcf2gt,
    compare_ibs,
    kcf2matrix,
    count,
]
