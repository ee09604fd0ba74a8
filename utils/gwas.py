#!/usr/bin/env python
"""GWAS over a kcftools genotype table (kcf2gt output) with a mixed
model. Python analog of the reference's utils/gwas.R (capability
parity): kinship correction via EMMAX-style GLS - estimate the variance
ratio once on the null model, then score every window with a
generalized-least-squares t-test - plus Manhattan and QQ plots and a
kinship heatmap.

Inputs:
  --gt     genotype table: ID CHR START END <sample...>, codes 0/1/2/-1
  --pheno  phenotype TSV: sample TAB value (header optional), one or
           more trait columns
Outputs (per trait, under --outdir):
  <trait>.gwas.res.tsv   ID CHR START END beta se t p
  <trait>.manhattan.png  -log10(p) by position
  <trait>.qq.png         observed vs expected quantiles
  <trait>.kinship.tsv / .kinship.png

Usage:
  python utils/gwas.py --gt gt.tsv --pheno pheno.tsv --outdir gwas_out \
      [--maf 0.05] [--max-missing 0.2]
"""

import argparse
import math
import os
import sys

import numpy as np


def read_gt(path):
    with open(path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        samples = header[4:]
        ids, chrs, starts, ends, rows = [], [], [], [], []
        for line in fh:
            f = line.rstrip("\n").split("\t")
            ids.append(f[0])
            chrs.append(f[1])
            starts.append(int(f[2]))
            ends.append(int(f[3]))
            rows.append(np.array(f[4:], dtype=np.float64))
    G = np.vstack(rows) if rows else np.empty((0, len(samples)))
    G[G < 0] = np.nan
    return ids, chrs, np.array(starts), np.array(ends), samples, G


def read_pheno(path):
    with open(path) as fh:
        first = fh.readline().rstrip("\n").split("\t")
        try:
            float(first[1])
            traits = [f"trait{i}" for i in range(1, len(first))]
            fh.seek(0)
        except ValueError:
            traits = first[1:]
        data = {}
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if len(f) < 2:
                continue
            data[f[0]] = [float(x) if x not in ("", "NA") else np.nan
                          for x in f[1:]]
    return traits, data


def vanraden_kinship(G):
    """Centered marker-based relationship matrix (markers x samples)."""
    p = np.nanmean(G, axis=1) / 2.0
    X = G - 2.0 * p[:, None]
    X = np.where(np.isnan(X), 0.0, X)
    denom = 2.0 * np.sum(p * (1 - p))
    return (X.T @ X) / max(denom, 1e-9)


def _null_reml(y, U, S):
    """Profile the variance ratio delta on the eigenbasis of K (EMMA)."""
    yy = U.T @ y
    one = U.T @ np.ones_like(y)
    best = (None, np.inf)
    for ld in np.linspace(-5, 5, 101):
        d = 10.0 ** ld
        w = 1.0 / (S + d)
        # GLS intercept
        b = (one * w) @ yy / max((one * w) @ one, 1e-12)
        r = yy - one * b
        sig = (r * w) @ r / len(y)
        ll = -0.5 * (len(y) * math.log(max(sig, 1e-300))
                     + np.sum(np.log(S + d)))
        if -ll < best[1]:
            best = (d, -ll)
    return best[0]


def gls_scan(G, y, K):
    """Per-marker GLS t-tests under y ~ N(mu + g beta, sg2 K + se2 I)."""
    from numpy.linalg import eigh

    n = len(y)
    S, U = eigh(K + 1e-6 * np.eye(n))
    S = np.maximum(S, 1e-9)
    delta = _null_reml(y, U, S)
    w = 1.0 / (S + delta)
    yt = U.T @ y
    ones = U.T @ np.ones(n)
    res_b, res_se, res_t, res_p = [], [], [], []
    try:
        from scipy.stats import t as tdist
        sf = lambda t, df: 2 * tdist.sf(abs(t), df)
    except ImportError:  # normal approximation
        sf = lambda t, df: math.erfc(abs(t) / math.sqrt(2))
    for g in G:
        gm = np.where(np.isnan(g), np.nanmean(g), g)
        gt_ = U.T @ gm
        X = np.stack([ones, gt_], axis=1)
        XtWX = (X * w[:, None]).T @ X
        XtWy = (X * w[:, None]).T @ yt
        try:
            beta = np.linalg.solve(XtWX, XtWy)
            cov = np.linalg.inv(XtWX)
        except np.linalg.LinAlgError:
            res_b.append(np.nan); res_se.append(np.nan)
            res_t.append(np.nan); res_p.append(np.nan)
            continue
        r = yt - X @ beta
        sig2 = (r * w) @ r / max(n - 2, 1)
        se = math.sqrt(max(cov[1, 1] * sig2, 1e-300))
        tstat = beta[1] / se
        res_b.append(beta[1]); res_se.append(se)
        res_t.append(tstat); res_p.append(sf(tstat, n - 2))
    return (np.array(res_b), np.array(res_se), np.array(res_t),
            np.array(res_p))


def manhattan(ax, chrs, starts, p):
    # alternating per-chromosome shades of ONE hue: position is the
    # identity channel, color only separates adjacent chromosomes
    shades = ["#0072B2", "#7FB2D5"]
    order = list(dict.fromkeys(chrs))
    off = 0
    ticks, names = [], []
    logp = -np.log10(np.maximum(p, 1e-300))
    for i, c in enumerate(order):
        m = np.array([x == c for x in chrs])
        x = starts[m] + off
        ax.scatter(x, logp[m], s=6, color=shades[i % 2], linewidths=0)
        ticks.append(off + (starts[m].max() if m.any() else 0) / 2)
        names.append(c)
        off += (starts[m].max() if m.any() else 0) + 1
    thr = 0.05 / max(len(p), 1)
    ax.axhline(-math.log10(thr), color="#D55E00", lw=1, ls="--",
               label=f"Bonferroni 0.05 ({thr:.1e})")
    ax.set_xticks(ticks)
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("-log10(p)")
    ax.legend(frameon=False, fontsize=8)
    ax.spines[["top", "right"]].set_visible(False)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--gt", required=True)
    ap.add_argument("--pheno", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--maf", type=float, default=0.05)
    ap.add_argument("--max-missing", type=float, default=0.2)
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.outdir, exist_ok=True)
    ids, chrs, starts, ends, samples, G = read_gt(args.gt)
    traits, pheno = read_pheno(args.pheno)
    common = [s for s in samples if s in pheno]
    if len(common) < 5:
        print("not enough common accessions between gt and pheno",
              file=sys.stderr)
        return 1
    sel = [samples.index(s) for s in common]
    G = G[:, sel]

    # marker filters
    miss = np.mean(np.isnan(G), axis=1)
    af = np.nanmean(G, axis=1) / 2.0
    maf = np.minimum(af, 1 - af)
    keep = (miss <= args.max_missing) & (maf >= args.maf)
    G = G[keep]
    ids = [i for i, k in zip(ids, keep) if k]
    chrs = [c for c, k in zip(chrs, keep) if k]
    starts, ends = starts[keep], ends[keep]
    print(f"{len(ids)} windows pass filters; {len(common)} accessions")
    if not len(ids):
        return 1

    K = vanraden_kinship(G)
    np.savetxt(os.path.join(args.outdir, "kinship.tsv"), K,
               delimiter="\t",
               header="\t".join(common), comments="")
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(K, cmap="Blues")  # sequential: one hue, light->dark
    ax.set_xticks(range(len(common)))
    ax.set_xticklabels(common, rotation=90, fontsize=6)
    ax.set_yticks(range(len(common)))
    ax.set_yticklabels(common, fontsize=6)
    fig.colorbar(im, label="kinship")
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "kinship.png"))
    plt.close(fig)

    for ti, trait in enumerate(traits):
        y = np.array([pheno[s][ti] for s in common])
        ok = ~np.isnan(y)
        if ok.sum() < 5:
            print(f"{trait}: too few phenotyped accessions; skipping")
            continue
        b, se, t, p = gls_scan(G[:, ok], y[ok], K[np.ix_(ok, ok)])
        res = os.path.join(args.outdir, f"{trait}.gwas.res.tsv")
        with open(res, "w") as out:
            out.write("ID\tCHR\tSTART\tEND\tbeta\tse\tt\tp\n")
            for i in range(len(ids)):
                out.write(
                    f"{ids[i]}\t{chrs[i]}\t{starts[i]}\t{ends[i]}\t"
                    f"{b[i]:.6g}\t{se[i]:.6g}\t{t[i]:.4f}\t{p[i]:.6g}\n"
                )
        fig, ax = plt.subplots(figsize=(10, 3.2))
        manhattan(ax, chrs, starts, p)
        ax.set_title(trait, fontsize=10)
        fig.tight_layout()
        fig.savefig(os.path.join(args.outdir, f"{trait}.manhattan.png"))
        plt.close(fig)
        # QQ
        ps = np.sort(p[~np.isnan(p)])
        exp = -np.log10((np.arange(len(ps)) + 0.5) / len(ps))
        fig, ax = plt.subplots(figsize=(3.6, 3.6))
        ax.plot(exp, -np.log10(np.maximum(ps, 1e-300)), ".",
                color="#0072B2", ms=3)
        lim = max(exp.max(), 1)
        ax.plot([0, lim], [0, lim], color="#999999", lw=1)
        ax.set_xlabel("expected -log10(p)")
        ax.set_ylabel("observed -log10(p)")
        ax.spines[["top", "right"]].set_visible(False)
        fig.tight_layout()
        fig.savefig(os.path.join(args.outdir, f"{trait}.qq.png"))
        plt.close(fig)
        print(f"{trait}: results + plots written to {args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
