"""Device-resident positional window scorer.

TPU-shaped split of the getVariations hot loop
(Plugins/GetVariants.java:202-261): the host owns the two things TPUs
are bad at - the per-sample sorted merge join (data-dependent, served
by the AVX-512 native tier) and the random positional gather - while
the device owns everything scan-shaped: the whole per-window gap-run
state machine re-expressed as prefix scans plus O(1) boundary gathers.

Measured tunnel characteristics on the target environment drive the
design:

  - one dispatch+fetch round trip costs tens of ms regardless of size,
    but async dispatches PIPELINE through the runtime
    => every sample is dispatched eagerly from a worker thread the
       moment its bitmap is packed; all round trips except the final
       sample's overlap the next sample's host work
  - host->device bandwidth collapses beyond ~1 MiB per transfer
    => the per-sample payload is ONE positional presence bitmap
       (1 bit per k-mer start; ~0.6 MiB for a 5 Mbp genome) packed by
       the native kcf_pack_posbits kernel, not per-unique u8 counts
  - XLA TPU gathers run ~150 M elem/s while cumsum/cummax scans are
    near-free
    => no gathers on device beyond B-sized window-boundary reads; the
       positional gather happens on host at memory speed
  - int64 is emulated on TPU
    => all device math is int32/uint32; the one genuinely 64-bit
       quantity (per-window exact count sums for MeanKmerCount) is
       folded on host by the same native pass that packs the bits

Per-sample device math is bit-identical to the host engine
(tests/test_device_prefix.py): for each window [s, hi] over k-mer
start positions,

  pres       = presence bits (valid k-mer && exact count >= min_count)
  cs_obs     = cumsum(pres)                    -> observed
  prev_ord   = cummax of present valid-ordinal -> interior gap sizes
  dist       = gap-(k-1) with the abs(d+1) clamp
               (GetVariants.java:267-273)
  next_ge /  = reverse cummin / cummax of present positions
  last_le      -> left/right tail distances
  variations = interior closed gaps + left/right tails, or (total>0)
               for windows with zero observed k-mers

Chromosomes are concatenated into fixed-shape SLABS (window-aligned
segments, so no window straddles a slab and per-window stats are exact
by construction), letting one compiled program cover the whole genome
and arbitrarily large references stream through bounded device memory.
Static per-window values (total k-mers, effective length) never depend
on the sample and stay with the caller.
"""

import functools
import os
import queue
import threading

from .. import jaxinit  # noqa: F401  (x64 + compile cache, before jax use)
import numpy as np

_POS_BUCKET = 1 << 20  # slab position padding granularity
_WIN_BUCKET = 1 << 10  # slab window padding granularity
_SEG_ALIGN = 64  # segments start on bit-word boundaries


def _round_up(n, m):
    return ((n + m - 1) // m) * m


_SCAN_BLK = 512  # slab padding granule (keeps reshape-based scans legal)


def _cumsum(x):
    import jax.numpy as jnp

    return jnp.cumsum(x)


def _cummax(x):
    import jax

    return jax.lax.cummax(x)


def _cummin_rev(x):
    import jax

    return jax.lax.cummin(x, reverse=True)


def _score_batch(bits, cs_tot, w_start, w_hi, *, k: int):
    """Score S samples over one slab.

    bits: tuple of S uint8 arrays (slab_pad/8,) - LSB-first positional
    presence bitmaps; cs_tot: (slab_pad+1,) int32 static prefix counts
    of valid k-mers; w_start/w_hi: (win_pad,) int32 window first/last
    k-mer start positions (inclusive, slab coords). Returns
    (5, S, win_pad) int32 rows: observed, variations, inner, left,
    right.
    """
    import jax
    import jax.numpy as jnp

    n = bits[0].shape[0] * 8
    shifts = jnp.arange(8, dtype=jnp.uint8)
    vidx = cs_tot[1:] - 1  # valid ordinal at each position (where valid)
    pos = jax.lax.iota(jnp.int32, n)
    s = w_start
    hi = w_hi
    total = cs_tot[hi + 1] - cs_tot[s]
    zero32 = jnp.zeros((1,), jnp.int32)

    def one(b8):
        pr = ((b8[:, None] >> shifts) & jnp.uint8(1)).reshape(n) != 0
        pres_ord = jnp.where(pr, vidx, jnp.int32(-1))
        shifted = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), pres_ord[:-1]]
        )
        prev_ord = _cummax(shifted)
        next_ge = _cummin_rev(jnp.where(pr, pos, jnp.int32(n)))
        last_le = _cummax(jnp.where(pr, pos, jnp.int32(-1)))

        cs_obs = jnp.concatenate([zero32, _cumsum(pr.astype(jnp.int32))])
        gap = vidx - prev_ord - 1
        closed = pr & (prev_ord >= 0) & (gap > 0)
        d = gap - (k - 1)
        dist = jnp.where(d > 0, d, jnp.abs(d + 1))
        cs_var = jnp.concatenate(
            [zero32, _cumsum(closed.astype(jnp.int32))]
        )
        # uint32 modular prefix; per-window diffs are exact (< 2^31)
        cs_dist = jnp.concatenate(
            [zero32.astype(jnp.uint32),
             _cumsum(jnp.where(closed, dist, 0).astype(jnp.uint32))]
        )

        observed = cs_obs[hi + 1] - cs_obs[s]
        has = observed > 0
        fp = jnp.clip(next_ge[s], 0, n - 1)
        lp = jnp.clip(last_le[hi], 0, n - 1)
        left = jnp.where(has, cs_tot[fp] - cs_tot[s], 0)
        right = jnp.where(has, cs_tot[hi + 1] - cs_tot[lp + 1], total)
        inner = jnp.where(
            has, cs_dist[hi + 1] - cs_dist[fp + 1], jnp.uint32(0)
        ).astype(jnp.int32)
        var_int = jnp.where(has, cs_var[hi + 1] - cs_var[fp + 1], 0)
        variations = jnp.where(
            has,
            var_int + (left > 0) + (right > 0),
            (total > 0).astype(jnp.int32),
        )
        return jnp.stack([observed, variations, inner, left, right])

    stacked = jnp.stack(bits)  # (S, slab_pad/8)
    return jnp.moveaxis(jax.vmap(one)(stacked), 0, 1)  # (5, S, win_pad)


class _Worker:
    """Single background thread running keyed jobs (upload + async
    dispatch) so device round trips overlap the producer's host work.
    Jobs run in submission order; results are retrieved by key."""

    def __init__(self):
        self._q = queue.Queue()
        self._results = {}
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            key, fn, event = item
            try:
                self._results[key] = fn()
            except Exception as e:  # surfaced on take()
                self._results[key] = e
            event.set()

    def submit(self, key, fn):
        event = threading.Event()
        self._q.put((key, fn, event))
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
        # join so no worker is mid-runtime-call when the process tears
        # the backend down (a daemon thread inside a dispatch at exit
        # aborts some PJRT runtimes)
        self._thread.join(timeout=30)


class _Layout:
    """Chromosomes -> window-aligned segments -> fixed-shape slabs."""

    def __init__(self, k, slab_pos):
        self.k = int(k)
        self.slab_pos = int(slab_pos)
        self._chroms = []  # (name, r_idx, w_start, w_hi)
        self.slabs = None

    def add_chrom(self, name, r_idx, starts, ends):
        w_start = np.ascontiguousarray(starts, np.int32)
        w_hi = (np.asarray(ends, np.int64) - self.k).astype(np.int32)
        self.add_chrom_kcoords(name, r_idx, w_start, w_hi)

    def add_chrom_kcoords(self, name, r_idx, w_start, w_hi):
        """Windows already in k-mer start coordinates (feature mode).
        Windows shorter than k (w_hi < w_start) clamp to the empty
        range [s, s-1]: zero totals, zero stats."""
        w_start = np.ascontiguousarray(w_start, np.int32)
        w_hi = np.maximum(
            np.ascontiguousarray(w_hi, np.int32), w_start - 1
        )
        self._chroms.append(
            (name, np.ascontiguousarray(r_idx, np.int32), w_start, w_hi)
        )

    def _segments(self):
        """Split each chromosome's window list into runs whose position
        span fits one slab. Window k-mer ranges never straddle a
        segment, so per-window stats are exact under any split."""
        segs = []
        for name, r_idx, w_start, w_hi in self._chroms:
            n_win = len(w_start)
            i = 0
            while i < n_win:
                base = int(w_start[i])
                j = i
                endp = int(w_hi[i])
                while j + 1 < n_win:
                    ne = max(endp, int(w_hi[j + 1]))
                    nb = min(base, int(w_start[j + 1]))
                    if ne - nb + 1 > self.slab_pos:
                        break
                    j += 1
                    endp = ne
                    base = nb
                endp = min(endp, r_idx.shape[0] - 1)
                if endp < base:
                    endp = base
                segs.append(
                    {
                        "chrom": name,
                        "r_idx": r_idx[base : endp + 1],
                        "w_start": w_start[i : j + 1] - base,
                        "w_hi": np.minimum(w_hi[i : j + 1], endp) - base,
                        "c_off": i,
                    }
                )
                i = j + 1
        return segs

    def finalize(self, n_parts: int = 1):
        if self.slabs is not None:
            return
        if n_parts > 1:
            # shard the genome across devices: aim for >= n_parts slabs
            # (window-aligned, so per-window stats stay exact)
            total = sum(c[1].shape[0] for c in self._chroms)
            self.slab_pos = max(
                _SEG_ALIGN, min(self.slab_pos, -(-total // n_parts))
            )
        segs = self._segments()
        # first-fit in order into slabs of <= slab_pos positions
        groups = []
        cur, cur_pos = [], 0
        for seg in segs:
            seg_len = _round_up(seg["r_idx"].shape[0], _SEG_ALIGN)
            if cur and cur_pos + seg_len > self.slab_pos:
                groups.append(cur)
                cur, cur_pos = [], 0
            cur.append(seg)
            cur_pos += seg_len
        if cur:
            groups.append(cur)

        if not groups:
            self.pos_pad = _SEG_ALIGN
            self.win_pad = 64
            self.slabs = []
            self.chrom_n_win = {
                name: len(ws) for name, _r, ws, _h in self._chroms
            }
            return
        # shared padded shapes so every slab reuses one compiled program;
        # big layouts bucket coarsely for compile reuse across runs,
        # small ones pad only to the bit-word grid
        maxp = max(
            sum(_round_up(s["r_idx"].shape[0], _SEG_ALIGN) for s in g)
            for g in groups
        )
        maxw = max(sum(len(s["w_start"]) for s in g) for g in groups)
        pos_pad = _round_up(
            maxp, _POS_BUCKET if maxp >= _POS_BUCKET else _SCAN_BLK
        )
        win_pad = _round_up(maxw, _WIN_BUCKET if maxw >= _WIN_BUCKET else 64)
        self.pos_pad = pos_pad
        self.win_pad = win_pad

        self.slabs = []
        for g in groups:
            r_idx = np.full(pos_pad, -1, np.int32)
            w_start = np.zeros(win_pad, np.int32)
            w_hi = np.zeros(win_pad, np.int32)
            wins = []  # (chrom, chrom_win_off, slab_win_off, count)
            p_off = 0
            w_off = 0
            for seg in g:
                sl = seg["r_idx"].shape[0]
                nw = len(seg["w_start"])
                r_idx[p_off : p_off + sl] = seg["r_idx"]
                w_start[w_off : w_off + nw] = seg["w_start"] + p_off
                w_hi[w_off : w_off + nw] = seg["w_hi"] + p_off
                wins.append((seg["chrom"], seg["c_off"], w_off, nw))
                p_off += _round_up(sl, _SEG_ALIGN)
                w_off += nw
            cs_tot = np.zeros(pos_pad + 1, np.int32)
            np.cumsum(r_idx >= 0, out=cs_tot[1:])
            self.slabs.append(
                {
                    "r_idx": r_idx,
                    "cs_tot": cs_tot,
                    "w_start": w_start,
                    "w_hi": w_hi,
                    "n_win": w_off,
                    "wins": wins,
                }
            )
        self.chrom_n_win = {
            name: len(ws) for name, _r, ws, _h in self._chroms
        }


_FIELDS = ("observed", "variations", "inner", "left", "right")


class DevicePrefixScorer:
    """Per-reference device state + batched per-sample scoring.

    Single-sample flow (plugin compatibility):
        add_chrom(...) per chromosome, then per sample
        merge_and_upload(...) / set_sample_counts(...) followed by
        score_chrom(name) per chromosome.

    Batched flow (S samples per device dispatch, amortizing the
    per-execution tunnel round trip):
        submit_counts(key, u8, exc_idx, exc_val) per sample, then
        collect(key) -> {chrom: {field: int64 array}}.
    """

    def __init__(self, refidx, k, min_count=1, device=None, batch=None,
                 devices=None):
        import jax

        self.k = int(k)
        self.min_count = int(min_count)
        if devices is None:
            devices = [device] if device is not None else jax.devices()
        self.devices = list(devices)
        self.device = self.devices[0]
        if batch is None:
            batch = int(os.environ.get("KCFTOOLS_DEVICE_BATCH", "8"))
        self.batch = max(1, int(batch))
        slab = int(
            os.environ.get("KCFTOOLS_DPREFIX_SLAB", str(1 << 26))
        )
        self._layout = _Layout(self.k, slab)
        self._worker = _Worker()
        self._statics = None  # per-slab device arrays
        self._score_fns = {}
        self._jobs = {}  # sample key -> worker job token
        self._csums = {}  # sample key -> per-slab count sums
        self._results = {}  # key -> {chrom: {field: array}}
        self._merge_buf = None  # reused per-sample merge output
        self._seq = 0

    # -- reference-side setup ------------------------------------------------

    def add_chrom(self, name, r_idx, starts, ends):
        """Register one chromosome's static arrays.
        starts/ends: half-open window base ranges (end - start >= k)."""
        self._layout.add_chrom(name, r_idx, starts, ends)

    def add_chrom_kcoords(self, name, r_idx, w_start, w_hi):
        """Windows given directly in k-mer start coordinates (feature
        mode: one window per spliced gene/transcript)."""
        self._layout.add_chrom_kcoords(name, r_idx, w_start, w_hi)

    def _finalize(self):
        if self._statics is not None:
            return
        import jax

        self._layout.finalize(n_parts=len(self.devices))
        self._statics = []
        for si, slab in enumerate(self._layout.slabs):
            dev = self.devices[si % len(self.devices)]
            self._statics.append(
                {
                    "device": dev,
                    "cs_tot": jax.device_put(slab["cs_tot"], dev),
                    "w_start": jax.device_put(slab["w_start"], dev),
                    "w_hi": jax.device_put(slab["w_hi"], dev),
                }
            )

    def _score_fn(self, n_samples):
        import jax

        if n_samples not in self._score_fns:
            self._score_fns[n_samples] = jax.jit(
                functools.partial(_score_batch, k=self.k)
            )
        return self._score_fns[n_samples]

    # -- per-sample ----------------------------------------------------------

    def merge_and_upload(self, ref_keys, db_keys, db_counts):
        """Native merge join + submit as the single pending sample.
        ref_keys/db_keys: uint64 arrays or (hi, lo) tuples (sorted)."""
        self.submit(None, ref_keys, db_keys, db_counts)

    def set_sample_counts(self, counts_u8, exc_idx, exc_val):
        self.submit_counts(None, counts_u8, exc_idx, exc_val)

    def submit(self, key, ref_keys, db_keys, db_counts):
        from ..native import merge_counts_u8

        n_ref = (
            ref_keys[0].shape[0]
            if isinstance(ref_keys, tuple)
            else ref_keys.shape[0]
        )
        if self._merge_buf is None or self._merge_buf.shape[0] < n_ref:
            self._merge_buf = np.empty(n_ref, np.uint8)
        u8, ei, ev = merge_counts_u8(
            ref_keys, db_keys, db_counts, out=self._merge_buf[:n_ref]
        )
        self.submit_counts(key, u8, ei, ev)

    def submit_counts(self, key, counts_u8, exc_idx, exc_val):
        """Pack positional presence bits + exact window count sums on
        host (native), then hand the sample to the worker thread, which
        uploads the bitmaps and dispatches the device program
        IMMEDIATELY (async). Dispatches pipeline through the runtime,
        so every round trip except the final sample's overlaps the next
        sample's host work - batching is unnecessary for latency hiding
        and ``batch`` only paces the caller's write-back grouping.
        key=None marks the single-sample flow."""
        from ..native import pack_posbits

        self._finalize()
        if key is None:
            # single-sample flow: a new sample invalidates the old one
            self._results.pop(None, None)
            old = self._jobs.pop(None, None)
            if old is not None:
                self._worker.take(old)
            self._csums.pop(None, None)
        exc_idx = np.ascontiguousarray(exc_idx, np.int32)
        exc_val = np.ascontiguousarray(exc_val, np.uint32)
        bits_list = []
        count_sums = []
        for si, slab in enumerate(self._layout.slabs):
            bits, csum = pack_posbits(
                counts_u8, exc_idx, exc_val, slab["r_idx"],
                self.min_count, slab["w_start"][: slab["n_win"]],
                slab["w_hi"][: slab["n_win"]],
                n_bits_bytes=self._layout.pos_pad // 8,
            )
            bits_list.append(bits)
            count_sums.append(csum)
        token = self._seq
        self._seq += 1
        self._worker.submit(token, lambda: self._dispatch_one(bits_list))
        self._jobs[key] = token
        self._csums[key] = count_sums

    def _dispatch_one(self, bits_list):
        """Worker thread: upload each slab's bitmap and launch the
        scoring program asynchronously; returns the result handles."""
        import jax

        fn = self._score_fn(1)
        handles = []
        for si, bits in enumerate(bits_list):
            st = self._statics[si]
            b = jax.device_put(bits, st["device"])
            h = fn((b,), st["cs_tot"], st["w_start"], st["w_hi"])
            # start the device->host copy as soon as the exec finishes,
            # so the fetch round trip overlaps later submits/writes
            try:
                h.copy_to_host_async()
            except AttributeError:
                pass
            handles.append(h)
        return handles

    def collect(self, key=None):
        """Return {chrom: {field: (n_windows,) int64 array}} for a
        submitted sample, awaiting its in-flight dispatch as needed."""
        if key in self._results:
            return self._results[key]
        if key not in self._jobs:
            raise KeyError(f"no submitted sample {key!r}")
        handles = self._worker.take(self._jobs.pop(key))
        csums = self._csums.pop(key)
        slabs = self._layout.slabs
        out = {
            name: {f: np.zeros(nw, np.int64) for f in _FIELDS}
            | {"count_sum": np.zeros(nw, np.int64)}
            for name, nw in self._layout.chrom_n_win.items()
        }
        for si, slab in enumerate(slabs):
            arr = np.asarray(handles[si])  # (5, 1, win_pad)
            csum = csums[si]
            for chrom, c_off, s_off, cnt in slab["wins"]:
                dst = out[chrom]
                for fi, f in enumerate(_FIELDS):
                    dst[f][c_off : c_off + cnt] = arr[
                        fi, 0, s_off : s_off + cnt
                    ]
                dst["count_sum"][c_off : c_off + cnt] = csum[
                    s_off : s_off + cnt
                ]
        self._results[key] = out
        return out

    def score_chrom(self, name):
        """Single-sample flow: stats for one chromosome."""
        return self.collect(None)[name]

    def devices_used(self):
        """Distinct devices holding slab state (for tests/telemetry)."""
        self._finalize()
        return {st["device"] for st in self._statics}

    def discard(self, key=None):
        self._results.pop(key, None)

    def close(self):
        self._worker.close()
