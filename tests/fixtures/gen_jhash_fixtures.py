#!/usr/bin/env python
"""Generate tests/fixtures/jhash_orders.json - pinned expected
java.util.HashMap iteration orders for realistic and adversarial
chromosome-name sets.

Derivation: see jhash_orders.README.md next to the output. The simple
(non-treeified) sets are hand-checkable with modular arithmetic
(String.hashCode -> spread -> bucket index at the final table size;
buckets ascending, insertion order within a bucket). The treeified
sets exercise the JDK TreeNode path (treeify + moveRootToFront +
putTreeVal list splicing + resize splits with untreeify), transcribed
in kcftools_tpu/utils/jhash.py from the JDK 8..21 HashMap source; the
fixture pins today's reviewed behavior so any later transcription
regression is caught.

Collision families used:
* "Aa" and "BB" hash identically (2112), so the 2^4 strings over
  {Aa,BB}^4 share one hashCode - inserting 9+ of them treeifies a bin
  once the table has grown to 64 slots (equal hashes: tree order =
  String.compareTo order).
* low6 set: names brute-forced so spread(hash) agrees in the LOW 6
  bits (same bucket in a 64-slot table) but differs at bit 6 - after
  the next resize the treeified bin SPLITS into two sub-6-node lists,
  exercising untreeify.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from kcftools_tpu.utils.jhash import (  # noqa: E402
    _spread,
    hashmap_iteration_order,
    java_string_hash,
)


def low6_collision_set():
    """9 ctg-style names with equal spread(hash) & 63, mixed bit 6."""
    by_low = {}
    for i in range(100000):
        name = f"ctg{i:05d}"
        s = _spread(java_string_hash(name))
        by_low.setdefault(s & 63, []).append((name, (s >> 6) & 1))
        got = by_low[s & 63]
        if len(got) >= 9:
            bits = [b for _n, b in got[:9]]
            if 3 <= sum(bits) <= 6:
                return [n for n, _b in got[:9]]
    raise SystemExit("no collision set found")


def main():
    sets = {}
    sets["human"] = [f"chr{i}" for i in range(1, 23)] + ["chrX", "chrY"]
    sets["lettuce"] = [f"LG_{i}" for i in range(1, 10)]
    sets["rice"] = [f"Chr{i}" for i in range(1, 13)]
    sets["scaffolds500"] = [f"scaffold_{i}" for i in range(1, 501)]
    # same-hash family: all 16 strings over {Aa,BB}^4 collide; plain
    # names first so the table is already at 64 slots when the bin
    # fills (25 fillers -> size 25..48 keeps the table at 64)
    fillers = [f"util_{i}" for i in range(1, 26)]
    family = []
    for a in ("Aa", "BB"):
        for b in ("Aa", "BB"):
            for c in ("Aa", "BB"):
                for d in ("Aa", "BB"):
                    family.append(a + b + c + d)
    sets["tree_samehash"] = fillers + family
    # distinct-hash collision bin that SPLITS (untreeify) on the next
    # resize: 25 fillers (table 64), 9 low-6-bit colliders (treeify),
    # then 15 more fillers push size past 48 -> resize to 128 -> split
    low6 = low6_collision_set()
    sets["tree_split"] = (
        fillers + low6 + [f"pad_{i}" for i in range(1, 16)]
    )

    out = {
        name: {
            "insert_order": keys,
            "iteration_order": hashmap_iteration_order(keys),
        }
        for name, keys in sets.items()
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "jhash_orders.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path} ({len(out)} sets)")
    for name, keys in sets.items():
        print(f"  {name}: {len(keys)} keys")


if __name__ == "__main__":
    main()
