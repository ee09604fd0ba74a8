"""Device-resident prefix-decomposition window scorer.

The hybrid engine (engine/prefix_scan.py) resolves per-position k-mer
counts and all prefix arrays on the host. On hosts with few cores the
per-sample cost is dominated by the 5-80 ms of pointer-chasing that the
per-position gather + scans take - while the TPU does the same work in
well under a millisecond (measured: 5M-element random gather 0.4 ms,
cumsum 0.2 ms, cummax 0.1 ms on one v5e chip).

This engine keeps everything static about the *reference* resident on
the device - the per-position unique-k-mer index ``r_idx`` (int32) and
the valid-k-mer prefix counts ``cs_tot`` - and reduces the per-sample
traffic to one uint8 array of saturated counts per unique reference
k-mer (native merge join emits it directly; exact values >= 255 ride a
tiny exception list and are scattered back on device). Per sample and
chromosome the device then runs the whole positional pipeline:

  widen u8 -> u32 (+ exception scatter)
  counts_pos = counts_u32[r_idx]                      (gather)
  present    = valid & counts_pos >= min_count
  cs_obs / cs_cnt / cs_var / cs_dist                  (cumsums)
  prev/next present position                          (cummax / reverse cummin)
  per-window stats                                    (B-sized boundary gathers)

semantically identical to the reference's per-window gap-run state
machine (Plugins/GetVariants.java:202-261, distance correction
GetVariants.java:267-273) and bit-identical to the host engine
(tests/test_device_prefix.py).

Static per-window values (total k-mers, effective length) never depend
on the sample; they are computed once on host via the host engine's
arrays and reused.

Shapes are bucketed (positions and uniques to 1 Mi, windows to 1 Ki,
exceptions to 64 Ki) so chromosomes of different sizes share compiled
programs. Per-sample uploads are sliced and handed to a background
uploader thread so host merge time and tunnel transfer time overlap.
"""

import functools
import queue
import threading

from .. import jaxinit  # noqa: F401  (x64 + compile cache, before jax use)
import numpy as np

_POS_BUCKET = 1 << 20
_WIN_BUCKET = 1 << 10
_EXC_BUCKET = 1 << 16
_N_SLICES = 8


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _widen_counts(slices, exc_idx, exc_val):
    """uint8 count slices -> one uint32 array with exceptions applied.
    Padding exception entries carry idx == total size (mode='drop')."""
    import jax.numpy as jnp

    u8 = jnp.concatenate(slices)
    u32 = u8.astype(jnp.uint32)
    return u32.at[exc_idx].set(exc_val, mode="drop")


def _score_chrom(counts_u32, r_idx, cs_tot, w_start, w_hi, *, k: int,
                 min_count: int):
    """All per-sample positional work for one chromosome.

    counts_u32: (U,) exact per-unique-kmer counts; r_idx: (Np,) int32
    (-1 invalid); cs_tot: (Np+1,) int32 prefix counts of valid k-mers
    (static); w_start/w_hi: (Bp,) int32 window first/last k-mer start
    positions (inclusive). Returns (6, Bp) int64 rows: observed,
    variations, inner, left, right, count_sum.
    """
    import jax
    import jax.numpy as jnp

    n = r_idx.shape[0]
    valid = r_idx >= 0
    cnt = counts_u32[jnp.maximum(r_idx, 0)]
    pres = valid & (cnt >= jnp.uint32(min_count))

    zero32 = jnp.zeros((1,), jnp.int32)
    zero64 = jnp.zeros((1,), jnp.int64)
    cs_obs = jnp.concatenate([zero32, jnp.cumsum(pres.astype(jnp.int32))])
    cs_cnt = jnp.concatenate(
        [zero64,
         jnp.cumsum(jnp.where(pres, cnt, jnp.uint32(0)).astype(jnp.int64))]
    )

    # ordinal of the k-mer at p among valid k-mers (valid positions only)
    vidx = cs_tot[1:] - 1
    pos = jax.lax.iota(jnp.int32, n)

    # previous present ordinal strictly before p (exclusive cummax)
    pres_ord = jnp.where(pres, vidx, jnp.int32(-1))
    shifted = jnp.concatenate([jnp.full((1,), -1, jnp.int32), pres_ord[:-1]])
    prev_ord = jax.lax.cummax(shifted)

    # first present position >= p / last present position <= p
    next_ge = jax.lax.cummin(
        jnp.where(pres, pos, jnp.int32(n)), reverse=True
    )
    last_le = jax.lax.cummax(jnp.where(pres, pos, jnp.int32(-1)))

    # per-present interior-gap contributions (GetVariants.java:267-273)
    gap = vidx - prev_ord - 1
    closed = pres & (prev_ord >= 0) & (gap > 0)
    d = gap - (k - 1)
    dist = jnp.where(d > 0, d, jnp.abs(d + 1))
    cs_var = jnp.concatenate([zero32, jnp.cumsum(closed.astype(jnp.int32))])
    cs_dist = jnp.concatenate(
        [zero64,
         jnp.cumsum(jnp.where(closed, dist, 0).astype(jnp.int64))]
    )

    # per-window boundary gathers
    s = w_start
    hi = w_hi
    total = cs_tot[hi + 1] - cs_tot[s]
    observed = cs_obs[hi + 1] - cs_obs[s]
    count_sum = cs_cnt[hi + 1] - cs_cnt[s]
    has = observed > 0

    fp = jnp.clip(next_ge[s], 0, n - 1)
    lp = jnp.clip(last_le[hi], 0, n - 1)
    left = jnp.where(has, cs_tot[fp] - cs_tot[s], 0)
    right = jnp.where(has, cs_tot[hi + 1] - cs_tot[lp + 1], total)
    inner = jnp.where(has, cs_dist[hi + 1] - cs_dist[fp + 1], 0)
    var_int = jnp.where(has, cs_var[hi + 1] - cs_var[fp + 1], 0)
    variations = jnp.where(
        has,
        var_int + (left > 0) + (right > 0),
        (total > 0).astype(jnp.int32),
    )
    return jnp.stack(
        [
            observed.astype(jnp.int64),
            variations.astype(jnp.int64),
            inner.astype(jnp.int64),
            left.astype(jnp.int64),
            right.astype(jnp.int64),
            count_sum,
        ]
    )


class _Uploader:
    """Background thread turning host buffers into device arrays so
    tunnel transfer overlaps the producer's compute."""

    def __init__(self, device):
        self._q = queue.Queue()
        self._results = {}
        self._device = device
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import jax

        while True:
            item = self._q.get()
            if item is None:
                return
            key, buf, event = item
            try:
                self._results[key] = jax.device_put(buf, self._device)
            except Exception as e:  # surfaced on take()
                self._results[key] = e
            event.set()

    def put(self, key, buf):
        event = threading.Event()
        self._q.put((key, buf, event))
        self._results[key] = event

    def take(self, key):
        r = self._results.pop(key)
        if isinstance(r, threading.Event):
            r.wait()
            r = self._results.pop(key)
        if isinstance(r, Exception):
            raise r
        return r

    def close(self):
        self._q.put(None)


class DevicePrefixScorer:
    """Per-reference device state + per-sample scoring.

    refidx: engine.refindex.RefKmerIndex (narrow or wide); windows are
    registered per chromosome with add_chrom() once, then each sample is
    one set_sample_counts() + score_chrom() sweep.
    """

    def __init__(self, refidx, k, min_count=1, device=None):
        import jax

        self.k = int(k)
        self.min_count = int(min_count)
        self.device = device or jax.devices()[0]
        n_u = refidx.n_kmers
        self._n_uniq = n_u
        self._u_pad = max(_round_up(n_u, _POS_BUCKET), _POS_BUCKET)
        assert self._u_pad % _N_SLICES == 0
        self._slice = self._u_pad // _N_SLICES
        self._chroms = {}
        self._counts_dev = None
        self._uploader = _Uploader(self.device)
        # inputs are device_put to self.device; jit follows placement
        self._widen = jax.jit(_widen_counts)
        self._score_fns = {}
        self._u8_buf = np.zeros(self._u_pad, np.uint8)

    def add_chrom(self, name, r_idx, starts, ends):
        """Register one chromosome's static arrays (uploaded once).
        starts/ends: half-open window base ranges (end - start >= k)."""
        import jax

        n_pos = r_idx.shape[0]
        np_pad = max(_round_up(n_pos, _POS_BUCKET), _POS_BUCKET)
        r_pad = np.full(np_pad, -1, np.int32)
        r_pad[:n_pos] = r_idx
        cs_tot = np.zeros(np_pad + 1, np.int32)
        np.cumsum(r_pad >= 0, out=cs_tot[1:])

        B = len(starts)
        b_pad = max(_round_up(B, _WIN_BUCKET), _WIN_BUCKET)
        w_start = np.zeros(b_pad, np.int32)
        w_hi = np.zeros(b_pad, np.int32)
        w_start[:B] = starts
        w_hi[:B] = np.asarray(ends) - self.k
        self._chroms[name] = {
            "r_idx": jax.device_put(r_pad, self.device),
            "cs_tot": jax.device_put(cs_tot, self.device),
            "w_start": jax.device_put(w_start, self.device),
            "w_hi": jax.device_put(w_hi, self.device),
            "n_windows": B,
        }

    def _score_fn(self, np_pad, b_pad):
        import jax

        key = (np_pad, b_pad)
        if key not in self._score_fns:
            self._score_fns[key] = jax.jit(
                functools.partial(
                    _score_chrom, k=self.k, min_count=self.min_count
                )
            )
        return self._score_fns[key]

    # -- per-sample ----------------------------------------------------------

    def merge_and_upload(self, ref_keys, db_keys, db_counts):
        """Sliced native merge join overlapped with slice uploads.
        ref_keys/db_keys: uint64 arrays or (hi, lo) tuples (sorted)."""
        from ..native import merge_counts_u8

        n_u = self._n_uniq
        exc_parts = []
        for si in range(_N_SLICES):
            lo = si * self._slice
            hi = min((si + 1) * self._slice, n_u)
            buf = np.empty(self._slice, np.uint8)
            if lo < n_u:
                _, eidx, eval_ = merge_counts_u8(
                    ref_keys, db_keys, db_counts, lo, hi, out=buf[: hi - lo]
                )
                if hi - lo < self._slice:
                    buf[hi - lo :] = 0
                if eidx.size:
                    exc_parts.append((eidx, eval_))
            else:
                buf[:] = 0
            self._uploader.put(("slice", si), buf)
        if exc_parts:
            exc_idx = np.concatenate([p[0] for p in exc_parts])
            exc_val = np.concatenate([p[1] for p in exc_parts])
        else:
            exc_idx = np.empty(0, np.int32)
            exc_val = np.empty(0, np.uint32)
        self.set_sample_slices(
            [self._uploader.take(("slice", si)) for si in range(_N_SLICES)],
            exc_idx,
            exc_val,
        )

    def set_sample_counts(self, counts_u8, exc_idx, exc_val):
        """counts_u8: (n_uniq,) saturated counts (host). Pads + uploads."""
        import jax

        buf = self._u8_buf
        buf[: self._n_uniq] = counts_u8
        buf[self._n_uniq :] = 0
        slices = [
            jax.device_put(
                buf[i * self._slice : (i + 1) * self._slice], self.device
            )
            for i in range(_N_SLICES)
        ]
        self.set_sample_slices(slices, exc_idx, exc_val)

    def set_sample_slices(self, slices, exc_idx, exc_val):
        import jax

        e_pad = max(_round_up(max(exc_idx.size, 1), _EXC_BUCKET), _EXC_BUCKET)
        ei = np.full(e_pad, self._u_pad, np.int32)  # out of range -> dropped
        ev = np.zeros(e_pad, np.uint32)
        ei[: exc_idx.size] = exc_idx
        ev[: exc_val.size] = exc_val
        self._counts_dev = self._widen(
            tuple(slices),
            jax.device_put(ei, self.device),
            jax.device_put(ev, self.device),
        )

    def score_chrom_async(self, name):
        """Dispatch one chromosome; returns a device handle (6, Bp)."""
        ch = self._chroms[name]
        fn = self._score_fn(ch["r_idx"].shape[0], ch["w_start"].shape[0])
        return fn(
            self._counts_dev, ch["r_idx"], ch["cs_tot"], ch["w_start"],
            ch["w_hi"],
        )

    def collect(self, name, handle):
        """Resolve a handle into the engine's standard dict (without the
        static total/eff_length fields - callers own those)."""
        B = self._chroms[name]["n_windows"]
        arr = np.asarray(handle)[:, :B]
        return {
            "observed": arr[0],
            "variations": arr[1],
            "inner": arr[2],
            "left": arr[3],
            "right": arr[4],
            "count_sum": arr[5],
        }

    def score_chrom(self, name):
        return self.collect(name, self.score_chrom_async(name))

    def close(self):
        self._uploader.close()
