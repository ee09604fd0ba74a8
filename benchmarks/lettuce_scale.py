#!/usr/bin/env python
"""The reference's only documented real workload, reproduced at scale.

kcftools' README ships an example KCF header produced from lettuce
chromosome 3 (`/root/reference/README.md:429-437`):

    ##contig=<ID=chr3,length=324658466>
    ##PARAM=<windowSize=50000,...,kmerSize=31>  ->  6,498 windows

This harness synthesizes a 324,658,466 bp contig, builds KMC databases
for --samples mutated samples (0.5% SNP rate), and times the full
`getVariations` command (ingest -> scoring -> KCF on disk) at exactly
that window geometry, asserting the window count matches the
reference's documented 6,498. Reports cold (index build included) and
warm wall-clock per engine.

RAM: peaks around ~12 GB during the reference-index build (325M
packed/canonical k-mers plus sort scratch). Disk: ~330 MB FASTA +
~2.7 GB KMC DB per sample.

    python benchmarks/lettuce_scale.py --samples 2 [--engines hybrid,dprefix]
"""

import argparse
import os
import resource
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

CHR3_LEN = 324_658_466  # README.md:433
K = 31
WINDOW = 50_000
EXPECT_WINDOWS = 6_498  # README.md:437 nWindows


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _write_fasta(path, genome):
    bases = np.frombuffer(b"ACGT", np.uint8)[genome]
    with open(path, "wb") as fh:
        fh.write(b">chr3\n")
        width = 60
        n = bases.shape[0]
        pad = (-n) % width
        rows = np.concatenate([bases, np.full(pad, ord("\n"), np.uint8)])
        rows = rows.reshape(-1, width)
        out = np.full((rows.shape[0], width + 1), ord("\n"), np.uint8)
        out[:, :width] = rows
        buf = out.tobytes()
        if pad:
            # drop the padded tail of the final row (keep its newline)
            buf = buf[: -(pad + 1)] + b"\n"
        fh.write(buf)


def _build_db(prefix, genome, rng, snp=0.005):
    from kcftools_tpu.engine.encode import canonicalize, pack_kmers
    from kcftools_tpu.io.kmc import write_kmc_db
    from kcftools_tpu.native import sort_pairs

    sample = genome.copy()
    flip = rng.random(genome.shape[0]) < snp
    sample[flip] = (sample[flip] + rng.integers(1, 4, flip.sum())) % 4
    valid = np.ones(sample.shape[0], bool)
    kmers, kv = pack_kmers(sample, valid, K)
    del sample, flip
    canon = canonicalize(kmers[kv], K)
    del kmers, kv
    # unique + counts via the native radix sort (np.unique on 325M
    # 62-bit keys costs minutes)
    ks, _ = sort_pairs(canon, np.empty(canon.shape[0], np.uint32))
    del canon
    keep = np.empty(ks.shape[0], bool)
    keep[:1] = True
    keep[1:] = ks[1:] != ks[:-1]
    uniq = ks[keep]
    idx = np.flatnonzero(keep)
    counts = np.diff(np.append(idx, ks.shape[0])).astype(np.uint64)
    del ks, keep, idx
    write_kmc_db(prefix, uniq, counts, K, counter_size=2)
    return uniq.shape[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--engines", default="hybrid")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    tmp = args.workdir or tempfile.mkdtemp(prefix="kcf_lettuce_")
    os.makedirs(tmp, exist_ok=True)
    ref = os.path.join(tmp, "ref.fa")
    need = [
        i for i in range(args.samples)
        if not os.path.exists(os.path.join(tmp, f"s{i}.kmc_suf"))
    ]
    if need or not os.path.exists(ref):
        rng = np.random.default_rng(0)
        print(f"synthesizing chr3 ({CHR3_LEN:,} bp) ...", flush=True)
        genome = rng.integers(0, 4, CHR3_LEN).astype(np.uint8)
        if not os.path.exists(ref):
            _write_fasta(ref, genome)
        # the rng stream feeding each sample's mutations must advance
        # deterministically whether or not earlier DBs are reused
        for i in range(args.samples):
            t0 = time.time()
            p = os.path.join(tmp, f"s{i}")
            if i in need:
                nk = _build_db(p, genome, rng)
                print(
                    f"sample s{i}: {nk:,} distinct {K}-mers "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
            else:
                rng.random(genome.shape[0])  # consume the flip draw
                rng.integers(1, 4, 1)
        del genome
    else:
        print(f"reusing {args.samples} sample DB(s) in {tmp}", flush=True)
    dbs = [os.path.join(tmp, f"s{i}") for i in range(args.samples)]
    names = [f"s{i}" for i in range(args.samples)]

    env = dict(os.environ)
    for eng in args.engines.split(","):
        out_dir = os.path.join(tmp, f"kcf_{eng}")
        # single-sample runs treat -o as the output FILE path
        first_kcf = (
            out_dir
            if args.samples == 1
            else os.path.join(out_dir, f"{names[0]}.kcf")
        )
        cmd = [
            sys.executable, "-m", "kcftools_tpu.cli", "getVariations",
            "-r", ref, "-k", ",".join(dbs), "-o", out_dir,
            "-s", ",".join(names), "-f", "window", "-w", str(WINDOW),
            "-t", "2", "-m", "--engine", eng,
        ]
        for label in ("cold", "warm"):
            if label == "cold":
                for f in os.listdir(tmp):
                    if ".kcfidx" in f or ".kcfplan" in f:
                        os.unlink(os.path.join(tmp, f))
            t0 = time.time()
            subprocess.run(cmd, check=True, env=env,
                           stdout=subprocess.DEVNULL)
            dt = time.time() - t0
            with open(first_kcf) as fh:
                n_win = sum(1 for l in fh if not l.startswith("#"))
            assert n_win == EXPECT_WINDOWS, n_win
            print(
                f"{eng} {label}: {dt:.1f}s for {args.samples} sample(s) "
                f"({args.samples * n_win / dt:.0f} windows/s end-to-end, "
                f"{n_win} windows as documented)",
                flush=True,
            )
    print(f"peak RSS: {rss_mb():.0f} MB")
    if not args.keep and args.workdir is None:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
