"""Reference k-mer index: per-position canonical k-mer identities,
computed once per (reference, k) and cached on disk.

``getVariations`` screens the *same* reference k-mer stream against every
sample's database. Factoring the stream as

  R      = sorted unique canonical k-mers of the reference
  r_idx  = per-position index into R (-1 where the k-mer spans non-ACGT)

turns each sample's lookup phase into one sorted-merge join of R against
the sample's (sorted) KMC table plus one small-table gather - both
host-bandwidth operations in the native tier - leaving the TPU the dense
window-scan work. The artifact is cached beside the FASTA
(``<fasta>.kcfidx.k<k>[.fwd].npz``) and regenerated on staleness, like
the reference's faidx sidecar (FastaIndex.java:31-36).
"""

import os

import numpy as np

from ..utils.logger import Logger
from .encode import canonicalize, pack_kmers

_CLASS = "RefKmerIndex"
_FORMAT_VERSION = 1


class RefKmerIndex:
    def __init__(self, kmers, chrom_names, chrom_r_idx, k, canonical):
        self.kmers = kmers  # (n_r,) uint64 sorted unique
        self.chrom_names = chrom_names
        self.chrom_r_idx = chrom_r_idx  # name -> int32 (L-k+1,), -1 invalid
        self.k = k
        self.canonical = canonical

    @staticmethod
    def cache_path(fasta_path, k, canonical):
        suffix = f".kcfidx.k{k}" + ("" if canonical else ".fwd") + ".npz"
        return fasta_path + suffix

    @classmethod
    def build(cls, index, k, canonical=True):
        """index: io.fasta.FastaIndex."""
        names = index.get_sequence_names()
        per_chrom_kmers = {}
        per_chrom_valid = {}
        for name in names:
            codes, valid = index.sequence_codes(name)
            kmers, kvalid = pack_kmers(codes, valid, k)
            if canonical and kmers.size:
                kmers = canonicalize(kmers, k)
            per_chrom_kmers[name] = kmers
            per_chrom_valid[name] = kvalid

        uniq_parts = [
            np.unique(per_chrom_kmers[name][per_chrom_valid[name]])
            for name in names
            if per_chrom_kmers[name].size
        ]
        R = (
            np.unique(np.concatenate(uniq_parts))
            if uniq_parts
            else np.empty(0, np.uint64)
        )

        chrom_r_idx = {}
        for name in names:
            kmers = per_chrom_kmers[name]
            kvalid = per_chrom_valid[name]
            r_idx = np.full(kmers.shape[0], -1, np.int32)
            if kmers.size:
                pos = np.searchsorted(R, kmers[kvalid]).astype(np.int32)
                r_idx[kvalid] = pos
            chrom_r_idx[name] = r_idx
        Logger.info(
            _CLASS,
            f"Built reference k-mer index: {R.size} unique {k}-mers over "
            f"{len(names)} sequences",
        )
        return cls(R, names, chrom_r_idx, k, canonical)

    @classmethod
    def load_or_build(cls, fasta_path, index, k, canonical=True):
        path = cls.cache_path(fasta_path, k, canonical)
        if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(
            fasta_path
        ):
            try:
                with np.load(path, allow_pickle=False) as z:
                    if int(z["format_version"][0]) == _FORMAT_VERSION:
                        names = [str(n) for n in z["chrom_names"]]
                        obj = cls(
                            z["kmers"],
                            names,
                            {n: z[f"ridx_{i}"] for i, n in enumerate(names)},
                            k,
                            canonical,
                        )
                        Logger.info(_CLASS, f"Loaded cached index: {path}")
                        return obj
            except Exception as e:
                Logger.warning(_CLASS, f"Ignoring bad index cache {path}: {e}")
        obj = cls.build(index, k, canonical)
        try:
            payload = {
                "format_version": np.array([_FORMAT_VERSION]),
                "kmers": obj.kmers,
                "chrom_names": np.array(obj.chrom_names),
            }
            for i, n in enumerate(obj.chrom_names):
                payload[f"ridx_{i}"] = obj.chrom_r_idx[n]
            np.savez(path, **payload)
            Logger.info(_CLASS, f"Cached index: {path}")
        except Exception as e:
            Logger.warning(_CLASS, f"Could not cache index at {path}: {e}")
        return obj
