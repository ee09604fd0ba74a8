"""Synthetic genome / sample generators for tests and benchmarks."""

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_seq(rng, n: int, n_prob: float = 0.0) -> str:
    codes = rng.integers(0, 4, size=n)
    arr = _BASES[codes]
    if n_prob > 0:
        mask = rng.random(n) < n_prob
        arr = np.where(mask, np.uint8(ord("N")), arr)
    return bytes(arr).decode()


def mutate(rng, seq: str, snp_rate: float = 0.0, del_rate: float = 0.0) -> str:
    """Introduce SNPs and short deletions into a copy of seq."""
    out = []
    i = 0
    arr = list(seq)
    while i < len(arr):
        r = rng.random()
        if r < del_rate:
            i += int(rng.integers(1, 5))
            continue
        c = arr[i]
        if rng.random() < snp_rate and c in "ACGT":
            choices = [b for b in "ACGT" if b != c]
            c = choices[int(rng.integers(0, 3))]
        out.append(c)
        i += 1
    return "".join(out)


def write_fasta(path, records, line_len: int = 60):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), line_len):
                fh.write(seq[i : i + line_len] + "\n")


def str_key_bytes(s: str) -> bytes:
    """k-mer string -> big-endian byte record (engine/encode_mlimb.py)."""
    k = len(s)
    nb = (k + 3) // 4
    pad = nb * 4 - k
    v = 0
    for c in "A" * pad + s:
        v = (v << 2) | "ACGT".index(c)
    return v.to_bytes(nb, "big")


def db_from_seqs(db_prefix, seqs, k, sig_len=9, both_strands=True):
    """Count k-mers naively and write a KMC-format DB; returns the dict."""
    from kcftools_tpu.engine.encode import str_to_kmer
    from kcftools_tpu.io.kmc import write_kmc_db
    from .oracle import count_db

    db = count_db(seqs, k, both_strands)
    if k > 64:
        nb = (k + 3) // 4
        keys = np.array([str_key_bytes(s) for s in db], dtype=f"S{nb}")
        counts = np.array(list(db.values()), dtype=np.uint64)
        order = np.argsort(keys)
        write_kmc_db(
            db_prefix, keys[order], counts[order], k,
            sig_len=sig_len, both_strands=both_strands,
        )
        return db
    kmers = np.array([str_to_kmer(s) for s in db], dtype=np.uint64)
    counts = np.array(list(db.values()), dtype=np.uint64)
    order = np.argsort(kmers)
    write_kmc_db(
        db_prefix, kmers[order], counts[order], k,
        sig_len=sig_len, both_strands=both_strands,
    )
    return db
