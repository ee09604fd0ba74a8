"""Multi-chip data parallelism on the DEFAULT path (VERDICT r1 #3):
with >1 visible devices, --engine auto must shard the genome across
chips (device engine slabs) and produce byte-identical output to the
single-host hybrid path. Runs on the 8-virtual-device CPU mesh."""

import os

import jax
import numpy as np
import pytest

from kcftools_tpu.cli import main as cli_main
from kcftools_tpu.engine.device_prefix import DevicePrefixScorer
from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.native import merge_counts_u8

from .gen import db_from_seqs, mutate, random_seq, write_fasta

K = 21
WIN = 400


def _strip(path):
    with open(path) as fh:
        return [
            ln for ln in fh
            if not ln.startswith("##CMD") and not ln.startswith("##DATE")
        ]


def test_scorer_shards_slabs_across_devices(rng):
    """Direct engine check: slabs land on >1 device and results match
    the numpy oracle merge+scan on every window."""
    n = 300_000
    genome = rng.integers(0, 4, n).astype(np.uint8)
    valid = np.ones(n, bool)
    kmers, kv = pack_kmers(genome, valid, K)
    canon = canonicalize(kmers, K)
    refk = np.unique(canon[kv])
    r_idx = np.searchsorted(refk, canon).astype(np.int32)
    r_idx[~kv] = -1
    starts, ends = tiling_windows(n, 2000, K)

    sample = genome.copy()
    snp = rng.random(n) < 0.01
    sample[snp] = (sample[snp] + rng.integers(1, 4, snp.sum())) % 4
    sk, skv = pack_kmers(sample, valid, K)
    db, dbc = np.unique(canonicalize(sk[skv], K), return_counts=True)
    dbc = dbc.astype(np.uint32)

    os.environ["KCFTOOLS_DPREFIX_SLAB"] = str(1 << 20)
    try:
        scorer = DevicePrefixScorer(None, K, min_count=1, batch=1)
        scorer.add_chrom("c", r_idx, starts, ends)
        devs = scorer.devices_used()
        assert len(devs) > 1, f"expected multi-device sharding, got {devs}"
        scorer.merge_and_upload(refk, db, dbc)
        res = scorer.score_chrom("c")
    finally:
        del os.environ["KCFTOOLS_DPREFIX_SLAB"]
        scorer.close()

    from kcftools_tpu.native import window_scan_u8

    u8, ei, ev = merge_counts_u8(refk, db, dbc)
    exp = window_scan_u8(u8, ei, ev, r_idx, 1, K, starts,
                         (ends - K).astype(np.int32))
    if exp is None:
        pytest.skip("native library unavailable")
    for f in ("observed", "variations", "inner", "left", "right",
              "count_sum"):
        np.testing.assert_array_equal(res[f], exp[f], err_msg=f)


def test_auto_engine_uses_devices_and_matches_hybrid(tmp_path, rng,
                                                     monkeypatch):
    """--engine auto on a multi-device host must pick the device engine
    and write a KCF byte-identical (minus CMD/DATE) to --engine hybrid."""
    assert jax.device_count() > 1
    chr1 = random_seq(rng, 6000, n_prob=0.004)
    chr2 = random_seq(rng, 4000, n_prob=0.004)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("chr1", chr1), ("chr2", chr2)])
    db_prefix = str(tmp_path / "db")
    db_from_seqs(db_prefix, [mutate(rng, chr1, 0.01), mutate(rng, chr2, 0.01)], K)

    out_h = str(tmp_path / "h.kcf")
    rc = cli_main(
        ["getVariations", "-r", ref, "-k", db_prefix, "-o", out_h,
         "-s", "s1", "-f", "window", "-w", str(WIN), "--engine", "hybrid"]
    )
    assert rc == 0

    monkeypatch.delenv("KCFTOOLS_NO_DEVICE_PROBE", raising=False)
    # small slabs so the toy genome still spreads over several devices
    monkeypatch.setenv("KCFTOOLS_DPREFIX_SLAB", str(1 << 20))
    out_a = str(tmp_path / "a.kcf")
    rc = cli_main(
        ["getVariations", "-r", ref, "-k", db_prefix, "-o", out_a,
         "-s", "s1", "-f", "window", "-w", str(WIN)]
    )
    assert rc == 0
    assert _strip(out_h) == _strip(out_a)


def test_memory_flag_matches_streamed(tmp_path, rng):
    """--memory (materialized) and the streamed low-memory default must
    produce identical KCFs."""
    chrom = random_seq(rng, 5000, n_prob=0.003)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("c1", chrom)])
    db_prefix = str(tmp_path / "db")
    db_from_seqs(db_prefix, [mutate(rng, chrom, 0.02)], K)
    out_s = str(tmp_path / "s.kcf")
    out_m = str(tmp_path / "m.kcf")
    base = ["getVariations", "-r", ref, "-k", db_prefix, "-s", "s1",
            "-f", "window", "-w", "400", "--engine", "hybrid"]
    assert cli_main(base + ["-o", out_s]) == 0
    assert cli_main(base + ["-o", out_m, "--memory"]) == 0
    assert _strip(out_s) == _strip(out_m)


def test_device_engine_streams_table_onto_mesh(tmp_path, rng):
    """--engine device without --memory on a multi-device mesh streams
    the KMC table through the sharded loader; output must match the
    hybrid engine."""
    chrom = random_seq(rng, 5000)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("c1", chrom)])
    db_prefix = str(tmp_path / "db")
    db_from_seqs(db_prefix, [mutate(rng, chrom, 0.02)], K)
    out_h = str(tmp_path / "h.kcf")
    out_d = str(tmp_path / "d.kcf")
    base = ["getVariations", "-r", ref, "-k", db_prefix, "-s", "s1",
            "-f", "window", "-w", "400"]
    assert cli_main(base + ["-o", out_h, "--engine", "hybrid"]) == 0
    assert cli_main(base + ["-o", out_d, "--engine", "device"]) == 0
    assert _strip(out_h) == _strip(out_d)


def test_multi_sample_dprefix_batched(tmp_path, rng, monkeypatch):
    """Multi-sample device-engine runs batch several samples per
    dispatch; every per-sample KCF must equal its hybrid twin."""
    chrom = random_seq(rng, 5000, n_prob=0.002)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("c1", chrom)])
    prefixes, names = [], []
    for i in range(3):
        p = str(tmp_path / f"db{i}")
        db_from_seqs(p, [mutate(rng, chrom, 0.01 * (i + 1))], K)
        prefixes.append(p)
        names.append(f"s{i}")
    monkeypatch.setenv("KCFTOOLS_DEVICE_BATCH", "2")
    outdir = tmp_path / "out_d"
    outdir.mkdir()
    rc = cli_main(
        ["getVariations", "-r", ref, "-k", ",".join(prefixes),
         "-s", ",".join(names), "-o", str(outdir), "-f", "window",
         "-w", "400", "--engine", "dprefix"]
    )
    assert rc == 0
    outdir_h = tmp_path / "out_h"
    outdir_h.mkdir()
    rc = cli_main(
        ["getVariations", "-r", ref, "-k", ",".join(prefixes),
         "-s", ",".join(names), "-o", str(outdir_h), "-f", "window",
         "-w", "400", "--engine", "hybrid"]
    )
    assert rc == 0
    for n in names:
        assert _strip(str(outdir / f"{n}.kcf")) == _strip(
            str(outdir_h / f"{n}.kcf")
        ), n


def test_sliding_windows_dprefix_matches_hybrid(tmp_path, rng):
    """Sliding mode (-p): window k-mer ranges OVERLAP, exercising the
    device layout's overlapping-segment handling."""
    chrom = random_seq(rng, 4000, n_prob=0.002)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("c1", chrom)])
    db_prefix = str(tmp_path / "db")
    db_from_seqs(db_prefix, [mutate(rng, chrom, 0.02)], K)
    outs = {}
    for eng in ("hybrid", "dprefix"):
        out = str(tmp_path / f"{eng}.kcf")
        rc = cli_main(
            ["getVariations", "-r", ref, "-k", db_prefix, "-o", out,
             "-s", "s1", "-f", "window", "-w", "500", "-p", "120",
             "--engine", eng]
        )
        assert rc == 0
        outs[eng] = _strip(out)
    assert outs["hybrid"] == outs["dprefix"]


def test_forced_table_axis_cli(tmp_path, rng, monkeypatch):
    """KCFTOOLS_TABLE_AXIS exercises the table-sharded --engine device
    branch of the plugin (auto-selected only for >4 GB tables)."""
    chrom = random_seq(rng, 5000)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, [("c1", chrom)])
    db_prefix = str(tmp_path / "db")
    db_from_seqs(db_prefix, [mutate(rng, chrom, 0.02)], K)
    base = ["getVariations", "-r", ref, "-k", db_prefix, "-s", "s1",
            "-f", "window", "-w", "400"]
    out_h = str(tmp_path / "h.kcf")
    assert cli_main(base + ["-o", out_h, "--engine", "hybrid"]) == 0
    monkeypatch.setenv("KCFTOOLS_TABLE_AXIS", "4")
    for memory in ((), ("--memory",)):
        out_d = str(tmp_path / f"d{len(memory)}.kcf")
        assert cli_main(
            base + ["-o", out_d, "--engine", "device", *memory]
        ) == 0
        assert _strip(out_h) == _strip(out_d)
