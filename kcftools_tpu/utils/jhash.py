"""Emulation of java.util.HashMap iteration order.

The reference's ``findIBS`` iterates chromosomes through a plain
``HashMap`` keySet (reference: Plugins/FindIBS.java:124,168), so the
output window order and IBS block numbering follow Java's hash-bucket
order rather than input order. Byte-identical replication requires
reproducing that order, which is fully deterministic: String.hashCode,
HashMap.hash spreading, power-of-two tables with 0.75 load factor and
order-preserving lo/hi splits on resize.

Treeification (bins >= 8 with table >= 64) changes within-bin order to
hash order; with realistic chromosome counts this never triggers, and we
raise if it would so the caller can fall back to sorted order explicitly.
"""

_INT_MASK = 0xFFFFFFFF


def java_string_hash(s: str) -> int:
    # Java hashes UTF-16 code units; surrogate pairs would need splitting,
    # but sequence names are ASCII in practice.
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & _INT_MASK
    return h


def _spread(h: int) -> int:
    return (h ^ (h >> 16)) & _INT_MASK


def hashmap_iteration_order(keys):
    """Return ``keys`` in the order a java.util.HashMap (default ctor)
    would iterate them after inserting in the given order."""
    cap = 16
    threshold = 12
    table = [[] for _ in range(cap)]
    size = 0
    for key in keys:
        h = _spread(java_string_hash(key))
        table[h & (cap - 1)].append((key, h))
        size += 1
        if size > threshold:
            cap *= 2
            threshold = int(cap * 0.75)
            new_table = [[] for _ in range(cap)]
            for bucket in table:
                for kv in bucket:
                    new_table[kv[1] & (cap - 1)].append(kv)
            table = new_table
    if cap >= 64 and any(len(b) >= 8 for b in table):
        raise RuntimeError(
            "HashMap bin would treeify; iteration order emulation unsupported"
        )
    out = []
    for bucket in table:
        out.extend(kv[0] for kv in bucket)
    return out
