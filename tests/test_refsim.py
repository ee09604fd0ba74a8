"""The refsim baseline engine must reproduce the reference's counting
exactly: its observed-per-window output is checked against the string
oracle on a synthetic genome + KMC database round-trip (signature map,
prefix LUT and suffix records all come from the production writer)."""

import numpy as np
import pytest

from kcftools_tpu.engine.encode import canonicalize, pack_kmers
from kcftools_tpu.engine.windows import tiling_windows
from kcftools_tpu.io.kmc import KMCReader, _build_norm, write_kmc_db
from kcftools_tpu.native import get_lib, refsim_scan

from .oracle import process_window


@pytest.mark.skipif(get_lib() is None, reason="native library required")
def test_refsim_matches_oracle(tmp_path):
    rng = np.random.default_rng(4)
    k = 31
    n = 40_000
    genome = rng.integers(0, 4, n).astype(np.uint8)
    genome[5000:5040] = 4  # an N run (sentinel > 3)
    valid = genome < 4
    sample = genome.copy()
    snp = rng.random(n) < 0.02
    sample[snp & valid] = (sample[snp & valid] + 1) % 4
    km, kv = pack_kmers(sample, valid, k)
    keys, counts = np.unique(canonicalize(km[kv], k), return_counts=True)
    db_prefix = str(tmp_path / "db")
    write_kmc_db(db_prefix, keys, counts.astype(np.uint32), k,
                 counter_size=2)

    r = KMCReader(db_prefix, materialize=False)
    suf_bytes = r.suffix_length // 4
    rec = suf_bytes + r.counter_size
    with open(r.suffix_file, "rb") as fh:
        fh.seek(4)
        raw = np.fromfile(fh, np.uint8, count=r.total_kmers * rec)
    starts, ends = tiling_windows(n, 3000, k)
    obs = refsim_scan(
        genome, k, starts, ends, r.signature_map, r.signature_length,
        r.prefix_array, r.lut_prefix_length, raw, r.total_kmers,
        suf_bytes, r.counter_size, _build_norm(r.signature_length),
        min_count=1, threads=2,
    )

    seq = "".join("ACGTN"[c] for c in genome)
    kstr = {}
    for key, c in zip(keys.tolist(), counts.tolist()):
        s = "".join("ACGT"[(int(key) >> (2 * (k - 1 - i))) & 3]
                    for i in range(k))
        kstr[s] = int(c)
    for w in range(len(starts)):
        exp = process_window(seq[starts[w]:ends[w]], k, kstr,
                             min_count=1, both_strands=True)
        assert obs[w] == exp["observed"], w
