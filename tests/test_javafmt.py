import numpy as np

from kcftools_tpu.utils import javafmt, jhash


def test_f2_half_up_ties():
    # exact-decimal ties round away from zero (Java HALF_UP), unlike
    # Python's round-half-even
    assert javafmt.f2(0.125) == "0.13"
    assert javafmt.f2(0.375) == "0.38"
    assert javafmt.f2(-0.125) == "-0.13"
    assert javafmt.f2(2.5e-3) == "0.00"  # 0.0025 not exactly representable


def test_f2_common():
    assert javafmt.f2(0.0) == "0.00"
    assert javafmt.f2(100.0) == "100.00"
    assert javafmt.f2(99.999) == "100.00"
    assert javafmt.f2(33.333333) == "33.33"
    assert javafmt.f2(1.005) == "1.00"  # 1.005 stored as 1.00499999...
    assert javafmt.f2(1.4e-45) == "0.00"


def test_dbl():
    assert javafmt.dbl(0.3) == "0.3"
    assert javafmt.dbl(0.4) == "0.4"
    assert javafmt.dbl(1.0) == "1.0"
    assert javafmt.dbl(95.0) == "95.0"
    assert javafmt.dbl(0.0) == "0.0"
    assert javafmt.dbl(1e7) == "1.0E7"
    assert javafmt.dbl(0.001) == "0.001"
    assert javafmt.dbl(1e-4) == "1.0E-4"
    assert javafmt.dbl(-2.5) == "-2.5"


def test_flt():
    assert javafmt.flt(np.float32(1.5)) == "1.5"
    assert javafmt.flt(np.float32(2.0)) == "2.0"
    assert javafmt.flt(np.float32(1.0) / np.float32(3.0)) == "0.33333334"
    assert javafmt.flt(np.float32(0.0)) == "0.0"


def test_java_string_hash():
    # values computed from the JDK definition s[0]*31^(n-1) + ...
    assert jhash.java_string_hash("") == 0
    assert jhash.java_string_hash("a") == 97
    assert jhash.java_string_hash("ab") == 97 * 31 + 98
    assert jhash.java_string_hash("chr1") == (
        ((ord("c") * 31 + ord("h")) * 31 + ord("r")) * 31 + ord("1")
    ) & 0xFFFFFFFF


def test_hashmap_order_is_permutation():
    keys = [f"chr{i}" for i in range(1, 25)]
    out = jhash.hashmap_iteration_order(keys)
    assert sorted(out) == sorted(keys)
    # deterministic
    assert out == jhash.hashmap_iteration_order(keys)


def test_hashmap_order_small():
    # with few ASCII keys hashing into distinct buckets of a 16-slot
    # table, iteration follows (hash ^ hash>>>16) & 15
    keys = ["A", "B", "C"]
    order = jhash.hashmap_iteration_order(keys)
    slots = {k: (jhash.java_string_hash(k) ^ (jhash.java_string_hash(k) >> 16)) & 15 for k in keys}
    assert order == sorted(keys, key=lambda k: slots[k])
