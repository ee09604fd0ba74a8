from .encode import pack_kmers, revcomp64, canonicalize, split_hi_lo
from .hashtable import KmerTable, build_table
from .pipeline import WindowScorer

__all__ = [
    "pack_kmers",
    "revcomp64",
    "canonicalize",
    "split_hi_lo",
    "KmerTable",
    "build_table",
    "WindowScorer",
]
