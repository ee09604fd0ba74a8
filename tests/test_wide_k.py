"""Wide k-mer (32 < k <= 64) support tests."""

import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.engine.encode_wide import (
    canonicalize_wide,
    from_value_limbs,
    pack_kmers_wide,
    revcomp_wide,
    str_to_wide_kmer,
    to_value_limbs,
    wide_kmer_to_str,
)
from kcftools_tpu.io.fasta import codes_from_str
from kcftools_tpu.io.kcf import KCFReader
from kcftools_tpu.io.kmc import KMCReader, write_kmc_db
from kcftools_tpu.native import wide

from .gen import mutate, random_seq, write_fasta
from .oracle import canonical, compute_score, process_window, revcomp

KS = [33, 45, 64]


def _pack_str(s, k):
    codes, valid = codes_from_str(s)
    A, B, kv = pack_kmers_wide(codes, valid, k)
    return A, B, kv


def test_pack_wide_matches_string(rng):
    for k in KS:
        seq = random_seq(rng, 300)
        A, B, kv = _pack_str(seq, k)
        assert kv.all()
        for i in range(0, len(A), 37):
            vhi, vlo = to_value_limbs(A[i : i + 1], B[i : i + 1], k)
            assert wide_kmer_to_str(vhi[0], vlo[0], k) == seq[i : i + k]


def test_revcomp_canonical_wide(rng):
    for k in KS:
        seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(50)]
        for s in seqs:
            codes, valid = codes_from_str(s)
            A, B, _ = pack_kmers_wide(codes, valid, k)
            rA, rB = revcomp_wide(A, B, k)
            vhi, vlo = to_value_limbs(rA, rB, k)
            assert wide_kmer_to_str(vhi[0], vlo[0], k) == revcomp(s)
            cA, cB = canonicalize_wide(A, B, k)
            vhi, vlo = to_value_limbs(cA, cB, k)
            assert wide_kmer_to_str(vhi[0], vlo[0], k) == canonical(s)


def test_value_limb_roundtrip(rng):
    for k in KS:
        seq = random_seq(rng, 200)
        A, B, _ = _pack_str(seq, k)
        vhi, vlo = to_value_limbs(A, B, k)
        A2, B2 = from_value_limbs(vhi, vlo, k)
        np.testing.assert_array_equal(A, A2)
        np.testing.assert_array_equal(B, B2)


def test_wide_sort_unique_and_search(rng):
    hi = rng.integers(0, 1 << 30, size=500, dtype=np.uint64)
    lo = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    uh, ul, uc = wide.sort_unique(hi, lo)
    vals = [(int(h) << 64) | int(l) for h, l in zip(uh, ul)]
    assert vals == sorted(set((int(h) << 64) | int(l) for h, l in zip(hi, lo)))
    assert int(uc.sum()) == 500
    idx = wide.searchsorted(uh, ul, hi, lo, None)
    assert (uh[idx] == hi).all() and (ul[idx] == lo).all()
    # absent key
    idx2 = wide.searchsorted(
        uh, ul, np.array([1 << 40], np.uint64) + uh[:1], np.array([7], np.uint64), None
    )
    # may or may not exist; just check dtype/stability
    assert idx2.dtype == np.int32


def test_kmc_roundtrip_wide(tmp_path, rng):
    for k in (45, 64):
        seq = random_seq(rng, 3000)
        codes, valid = codes_from_str(seq)
        A, B, kv = pack_kmers_wide(codes, valid, k)
        cA, cB = canonicalize_wide(A, B, k)
        vhi, vlo = to_value_limbs(cA, cB, k)
        uh, ul, uc = wide.sort_unique(vhi[kv], vlo[kv])
        prefix = str(tmp_path / f"wdb{k}")
        write_kmc_db(prefix, (uh, ul), uc, k)
        r = KMCReader(prefix)
        assert r.kmer_length == k and r.wide
        rh, rl, rc = wide.sort_unique(r.kmers_hi, r.kmers_lo, r.counts)
        np.testing.assert_array_equal(rh, uh)
        np.testing.assert_array_equal(rl, ul)
        np.testing.assert_array_equal(rc, uc)


def test_get_variations_wide_vs_oracle(tmp_path, rng):
    k = 45
    chrom = random_seq(rng, 4000, n_prob=0.005)
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, [("c1", chrom)])
    sample = mutate(rng, chrom, snp_rate=0.01, del_rate=0.002)
    db_prefix = str(tmp_path / "db")
    sfa = str(tmp_path / "s.fa")
    write_fasta(sfa, [("c1", sample)])
    assert cli_main(["count", "-i", sfa, "-o", db_prefix, "-k", str(k)]) == 0

    out = str(tmp_path / "out.kcf")
    assert cli_main(
        ["getVariations", "-r", fa, "-k", db_prefix, "-o", out,
         "-s", "sW", "-f", "window", "-w", "600"]
    ) == 0
    block = KCFReader(out).read_all()
    db = {}
    # oracle db from the sample (canonical string keys)
    for i in range(len(sample) - k + 1):
        sub = sample[i : i + k].upper()
        if all(c in "ACGT" for c in sub):
            key = canonical(sub)
            db[key] = db.get(key, 0) + 1
    i = 0
    last_end = 0
    while last_end < len(chrom):
        start = max(0, last_end - k + 1)
        end = min(start + 600, len(chrom))
        if end - start >= k:
            exp = process_window(chrom[start:end], k, db)
            assert block.start[i] == start and block.end[i] == end
            assert block.total_kmers[i] == exp["total"]
            assert block.ob[0, i] == exp["observed"]
            assert block.va[0, i] == exp["variations"]
            assert block.inner[0, i] == exp["inner"]
            assert block.left[0, i] == exp["left"]
            assert block.right[0, i] == exp["right"]
            assert block.kmer_count[0, i] == exp["count_sum"]
            assert block.eff_length[i] == exp["eff_length"]
            sc = compute_score(
                exp["observed"], exp["total"], exp["eff_length"],
                exp["inner"], exp["left"] + exp["right"], (0.3, 0.3, 0.4),
            )
            assert abs(block.score[0, i] - sc) < 1e-12
            i += 1
        if end <= last_end:
            break
        last_end = end
    assert i == len(block)


def test_merge_counts_u8_wide_threaded(rng):
    """Wide-key SIMD/threaded merge against the exact wide merge on a
    size that crosses the thread threshold, with >=255 counts."""
    from kcftools_tpu.native import merge_counts_u8

    n = 700_000
    hi = rng.integers(0, 1 << 40, n).astype(np.uint64)
    lo = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    rh, rl, _ = wide.sort_unique(hi, lo)
    keep = rng.random(rh.shape[0]) > 0.25
    nh = rng.integers(0, 1 << 40, n // 4).astype(np.uint64)
    nl = rng.integers(0, 1 << 64, n // 4, dtype=np.uint64)
    dh, dl, _ = wide.sort_unique(
        np.concatenate([rh[keep], nh]), np.concatenate([rl[keep], nl])
    )
    dc = rng.integers(1, 50, dh.shape[0]).astype(np.uint32)
    big = rng.integers(0, dh.shape[0], 300)
    dc[big] = rng.integers(255, 100_000, 300).astype(np.uint32)

    exact = wide.merge_counts(rh, rl, dh, dl, dc)
    u8, ei, ev = merge_counts_u8((rh, rl), (dh, dl), dc)
    rebuilt = u8.astype(np.uint32)
    rebuilt[ei] = ev
    np.testing.assert_array_equal(rebuilt, exact)
    assert (np.diff(ei) > 0).all()
    # sliced calls agree
    mid = rh.shape[0] // 3
    u8a, eia, eva = merge_counts_u8((rh, rl), (dh, dl), dc, 0, mid)
    u8b, eib, evb = merge_counts_u8((rh, rl), (dh, dl), dc, mid, rh.shape[0])
    np.testing.assert_array_equal(np.concatenate([u8a, u8b]), u8)
    np.testing.assert_array_equal(np.concatenate([eia, eib]), ei)
    np.testing.assert_array_equal(np.concatenate([eva, evb]), ev)


def test_merge_counts_u8_exc_cap_paths(rng):
    """Exception-capacity handling: a db dominated by >=255 counts must
    not break the native merge (the db-side saturation list is
    unbounded; the matched-exception cap retries slice-sized). Covers
    both narrow and wide keys, and documents that the SIMD kernel only
    runs on AVX-512 VBMI hosts - elsewhere the same entry points take
    the scalar path, so the assertion is identical."""
    from kcftools_tpu.native import merge_counts, merge_counts_u8

    n = 60_000
    # wide keys: every db count >= 255 -> db-side exceptions == n_db,
    # far beyond the default cap of max(1024, n//64)
    hi = rng.integers(0, 1 << 40, n).astype(np.uint64)
    lo = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    rh, rl, _ = wide.sort_unique(hi, lo)
    dh, dl, _ = wide.sort_unique(hi[: n // 2], lo[: n // 2])
    dc = rng.integers(255, 1 << 20, dh.shape[0]).astype(np.uint32)
    exact = wide.merge_counts(rh, rl, dh, dl, dc)
    u8, ei, ev = merge_counts_u8((rh, rl), (dh, dl), dc, exc_cap=16)
    rebuilt = u8.astype(np.uint32)
    rebuilt[ei] = ev
    np.testing.assert_array_equal(rebuilt, exact)

    # narrow keys, same saturation-heavy shape
    rk = np.unique(rng.integers(0, 1 << 62, n).astype(np.uint64))
    dk = np.unique(rk[rng.random(rk.shape[0]) < 0.5])
    dcn = rng.integers(255, 1 << 20, dk.shape[0]).astype(np.uint32)
    exactn = merge_counts(rk, dk, dcn)
    u8n, ein, evn = merge_counts_u8(rk, dk, dcn, exc_cap=16)
    rebuiltn = u8n.astype(np.uint32)
    rebuiltn[ein] = evn
    np.testing.assert_array_equal(rebuiltn, exactn)
