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
    def __init__(self, kmers, chrom_names, chrom_r_idx, k, canonical,
                 kmers_hi=None, kmers_lo=None):
        self.kmers = kmers  # (n_r,) uint64 sorted unique (k <= 32)
        self.kmers_hi = kmers_hi  # wide-k: 128-bit value limbs
        self.kmers_lo = kmers_lo
        self.chrom_names = chrom_names
        self.chrom_r_idx = chrom_r_idx  # name -> int32 (L-k+1,), -1 invalid
        self.k = k
        self.canonical = canonical

    @property
    def wide(self):
        return self.kmers_hi is not None

    @property
    def n_kmers(self):
        return (
            self.kmers_hi.shape[0] if self.wide else self.kmers.shape[0]
        )

    @staticmethod
    def cache_path(fasta_path, k, canonical):
        suffix = f".kcfidx.k{k}" + ("" if canonical else ".fwd") + ".npz"
        return fasta_path + suffix

    @classmethod
    def build(cls, index, k, canonical=True):
        """index: io.fasta.FastaIndex."""
        if k > 32:
            return cls._build_wide(index, k, canonical)
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
    def _build_wide(cls, index, k, canonical=True):
        from ..native import wide
        from .encode_wide import canonicalize_wide, pack_kmers_wide, to_value_limbs

        names = index.get_sequence_names()
        per_chrom = {}
        parts_hi, parts_lo = [], []
        for name in names:
            codes, valid = index.sequence_codes(name)
            A, B, kvalid = pack_kmers_wide(codes, valid, k)
            if canonical and A.size:
                A, B = canonicalize_wide(A, B, k)
            vhi, vlo = to_value_limbs(A, B, k)
            per_chrom[name] = (vhi, vlo, kvalid)
            if A.size:
                uh, ul, _ = wide.sort_unique(vhi[kvalid], vlo[kvalid])
                parts_hi.append(uh)
                parts_lo.append(ul)
        if parts_hi:
            R_hi, R_lo, _ = wide.sort_unique(
                np.concatenate(parts_hi), np.concatenate(parts_lo)
            )
        else:
            R_hi = R_lo = np.empty(0, np.uint64)

        chrom_r_idx = {}
        for name in names:
            vhi, vlo, kvalid = per_chrom[name]
            chrom_r_idx[name] = wide.searchsorted(
                R_hi, R_lo, vhi, vlo, kvalid.astype(np.uint8)
            )
        Logger.info(
            _CLASS,
            f"Built reference k-mer index: {R_hi.size} unique {k}-mers "
            f"(wide) over {len(names)} sequences",
        )
        return cls(None, names, chrom_r_idx, k, canonical,
                   kmers_hi=R_hi, kmers_lo=R_lo)

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
                        ridx = {n: z[f"ridx_{i}"] for i, n in enumerate(names)}
                        if "kmers_hi" in z.files:
                            obj = cls(None, names, ridx, k, canonical,
                                      kmers_hi=z["kmers_hi"],
                                      kmers_lo=z["kmers_lo"])
                        else:
                            obj = cls(z["kmers"], names, ridx, k, canonical)
                        Logger.info(_CLASS, f"Loaded cached index: {path}")
                        return obj
            except Exception as e:
                Logger.warning(_CLASS, f"Ignoring bad index cache {path}: {e}")
        obj = cls.build(index, k, canonical)
        try:
            payload = {
                "format_version": np.array([_FORMAT_VERSION]),
                "chrom_names": np.array(obj.chrom_names),
            }
            if obj.wide:
                payload["kmers_hi"] = obj.kmers_hi
                payload["kmers_lo"] = obj.kmers_lo
            else:
                payload["kmers"] = obj.kmers
            for i, n in enumerate(obj.chrom_names):
                payload[f"ridx_{i}"] = obj.chrom_r_idx[n]
            np.savez(path, **payload)
            Logger.info(_CLASS, f"Cached index: {path}")
        except Exception as e:
            Logger.warning(_CLASS, f"Could not cache index at {path}: {e}")
        return obj
