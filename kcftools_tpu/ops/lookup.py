"""Device-side bucketed hash table lookup.

Two 8-wide row gathers + vectorized compares per query; see
engine/hashtable.py for the layout. The hash functions here must remain
bit-identical with engine.hashtable.bucket_hashes_np.
"""

from .. import jaxinit  # noqa: F401  (x64 + compile cache, before jax use)
import jax.numpy as jnp
import numpy as np

_C1A = np.uint32(0x9E3779B1)
_C1B = np.uint32(0x85EBCA77)
_C2A = np.uint32(0xC2B2AE3D)
_C2B = np.uint32(0x27D4EB2F)
_S1 = np.uint32(0xA5A5A5A5)
_S2 = np.uint32(0x3C6EF372)


def _fmix32(h):
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def bucket_hashes_jnp(hi, lo, n_buckets: int):
    mask = jnp.uint32(n_buckets - 1)
    h1 = _fmix32(hi * _C1A + lo * _C1B + _S1) & mask
    h2 = _fmix32(hi * _C2A + lo * _C2B + _S2) & mask
    return h1, h2


def table_lookup(hi, lo, tbl):
    """Counts for queries (hi, lo) of any shape against the interleaved
    table (nb, 3*S): row = [hi x S | lo x S | cnt x S]. One row gather
    per probed bucket (the layout exists to make each gather pull one
    contiguous 48-byte line). Returns uint32 counts, 0 for absent keys."""
    nb = tbl.shape[0]
    S = tbl.shape[1] // 3
    h1, h2 = bucket_hashes_jnp(hi, lo, nb)
    out = jnp.zeros(hi.shape, jnp.uint32)
    # a key lives in exactly one bucket; when h1 == h2 only count it once
    for b, dedup in ((h1, None), (h2, h2 != h1)):
        rows = tbl[b]  # (..., 3*S) - a single contiguous row gather
        match = (
            (rows[..., 0:S] == hi[..., None])
            & (rows[..., S : 2 * S] == lo[..., None])
            & (rows[..., 2 * S :] != 0)
        )
        contrib = jnp.sum(
            jnp.where(match, rows[..., 2 * S :], jnp.uint32(0)),
            axis=-1,
            dtype=jnp.uint32,
        )
        if dedup is not None:
            contrib = jnp.where(dedup, contrib, jnp.uint32(0))
        out = out + contrib
    return out
