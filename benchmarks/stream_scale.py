#!/usr/bin/env python
"""Streaming-transform scale harness: a synthetic multi-million-window
KCF flows through cohort + findIBS under a measured peak-RSS cap.

Generates N single-sample KCFs of --windows rows each directly as text
(no scoring involved - this exercises the KCF parse/merge/sweep/format
path), runs

    cohort  (N files -> one multi-sample KCF)
    findIBS (--summary)

in subprocesses, and reports each stage's wall time, throughput, and
peak RSS. With --rss-cap-mb the run FAILS if any stage's peak RSS
exceeds the cap - the bounded-memory guarantee of the streaming
transforms (plugins/cohort.py, plugins/find_ibs.py), which the
reference cannot make (it materializes every input:
Cohort.java:80-119, FindIBS.java:85-116).

Example (the wheat-shaped rung: 5M windows x 20 samples, ~2 GB of
cohort KCF text, under a 4 GB cap):

    python benchmarks/stream_scale.py --windows 5000000 --samples 20 \\
        --rss-cap-mb 4096
"""

import argparse
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _write_sample_kcf(path, sample, windows, n_chroms, win, rng):
    """Plausible single-sample KCF text, written streamed."""
    per_chrom = windows // n_chroms
    header = [
        "##format=KCF0.1",
        "##date=2026-01-01",
        "##source=kcftools",
        "##reference=synthetic.fa",
    ]
    for c in range(n_chroms):
        header.append(
            f"##contig=<ID=chr{c + 1},length={per_chrom * win}>"
        )
    header += [
        "##PARAM=<ID=window,value=%d>" % win,
        "##PARAM=<ID=step,value=0>",
        "##PARAM=<ID=kmer,value=31>",
        "##PARAM=<ID=IBS,value=false>",
        "##PARAM=<ID=nwindow,value=%d>" % (per_chrom * n_chroms),
        "##PARAM=<ID=wti,value=0.3>",
        "##PARAM=<ID=wtt,value=0.3>",
        "##PARAM=<ID=wtk,value=0.4>",
        "#CHROM\tSTART\tEND\tID\tTOTAL_KMERS\tINFO\tFORMAT\t" + sample,
    ]
    total = win - 30
    with open(path, "w", buffering=1 << 22) as fh:
        fh.write("\n".join(header) + "\n")
        for c in range(n_chroms):
            chrom = f"chr{c + 1}"
            # IBS-like score tracts so findIBS produces real blocks
            tract = rng.integers(0, 2, per_chrom // 50 + 2).astype(bool)
            for i in range(per_chrom):
                start = i * win
                hi_tract = tract[i // 50]
                ob = total - (rng.integers(0, 40) if hi_tract
                              else rng.integers(500, 4000))
                va = 0 if ob == total else int(rng.integers(1, 30))
                sc = 100.0 * ob / total
                fh.write(
                    f"{chrom}\t{start}\t{start + win}\t{chrom}_{start}\t"
                    f"{total}\tEFFLEN={win};IS={sc:.2f};XS={sc:.2f};"
                    f"MS={sc:.2f};IO={ob};XO={ob};MO={ob}.00;IV={va};"
                    f"XV={va};MV={va}.0\tGT:VA:OB:ID:LD:RD:KD:SC\t"
                    f"N:{va}:{ob}:{total - ob}:0:0:1.00:{sc:.2f}\n"
                )


def _run_stage(name, argv, cap_mb):
    t0 = time.time()
    code = (
        "import resource, sys\n"
        "from kcftools_tpu.cli import main\n"
        "rc = main(sys.argv[1:])\n"
        "rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024\n"
        "print(f'__RSS__ {rss}', file=sys.stderr)\n"
        "sys.exit(rc)\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.join(os.path.dirname(__file__), "..")
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    p = subprocess.run(
        [sys.executable, "-c", code] + argv,
        capture_output=True, text=True, env=env,
    )
    dt = time.time() - t0
    rss = None
    for line in p.stderr.splitlines():
        if line.startswith("__RSS__"):
            rss = int(line.split()[1])
    if p.returncode != 0:
        sys.stderr.write(p.stderr)
        raise SystemExit(f"{name} failed rc={p.returncode}")
    print(f"{name}: {dt:.1f}s, peak RSS {rss} MB")
    if cap_mb and rss > cap_mb:
        raise SystemExit(
            f"{name} peak RSS {rss} MB exceeds the {cap_mb} MB cap"
        )
    return dt, rss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=1_000_000)
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--chroms", type=int, default=21)
    ap.add_argument("--window-size", type=int, default=3000)
    ap.add_argument("--rss-cap-mb", type=int, default=0)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import shutil
    import tempfile

    tmp = args.workdir or tempfile.mkdtemp(prefix="kcf_stream_")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(0)
    print(
        f"generating {args.samples} x {args.windows:,}-window KCFs ..."
    )
    t0 = time.time()
    paths = []
    for s in range(args.samples):
        p = os.path.join(tmp, f"s{s}.kcf")
        _write_sample_kcf(
            p, f"s{s}", args.windows, args.chroms, args.window_size, rng
        )
        paths.append(p)
    gen_dt = time.time() - t0
    total_mb = sum(os.path.getsize(p) for p in paths) / 1e6
    print(f"generated {total_mb:.0f} MB of KCF in {gen_dt:.0f}s")

    coh = os.path.join(tmp, "cohort.kcf")
    dt, _ = _run_stage(
        "cohort", ["cohort", "-o", coh, "-i", ",".join(paths)],
        args.rss_cap_mb,
    )
    rows = args.windows
    print(f"  cohort throughput: {rows / dt:.0f} windows/s "
          f"({rows * args.samples / dt:.0f} cells/s)")
    ibs = os.path.join(tmp, "ibs")
    dt, _ = _run_stage(
        "findIBS",
        ["findIBS", "-i", coh, "-o", ibs, "--summary", "--score", "95"],
        args.rss_cap_mb,
    )
    print(f"  findIBS throughput: {rows / dt:.0f} windows/s")
    with open(ibs + ".summary.tsv") as fh:
        n_blocks = sum(1 for _ in fh) - 1
    print(f"  findIBS summary blocks: {n_blocks}")
    if not args.keep:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
