"""Native C kernels must be bit-identical to the pure-Python reference
implementations (and therefore to DuckDB's Jaro-Winkler)."""

import math
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from payor_mdm_spark.functions import similarity as sim
from payor_mdm_spark.functions.native_kernels import (
    get_lib,
    native_jaro_winkler,
    native_trigram_cosine,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C compiler")

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=60,
)


def _py_jw(a, b):
    """The pure-Python reference path, bypassing native dispatch."""
    j = sim.jaro(a, b)
    if j > 0.7:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        j += prefix * 0.1 * (1.0 - j)
    return j


def _py_trigram(a, b):
    ga, gb = Counter(sim._ngrams(a)), Counter(sim._ngrams(b))
    common = set(ga) & set(gb)
    dot = sum(ga[g] * gb[g] for g in common)
    ma = math.sqrt(sum(v * v for v in ga.values()))
    mb = math.sqrt(sum(v * v for v in gb.values()))
    return dot / (ma * mb) if ma and mb else 0.0


@settings(max_examples=500, deadline=None)
@given(_ASCII, _ASCII)
def test_native_jw_bit_identical(a, b):
    if not a or not b:
        return
    native = native_jaro_winkler(a, b)
    assert native is not None
    assert native == _py_jw(a, b)  # exact, not approx


@settings(max_examples=500, deadline=None)
@given(_ASCII, _ASCII)
def test_native_trigram_bit_identical(a, b):
    native = native_trigram_cosine(a, b)
    assert native is not None
    assert native == _py_trigram(a, b)


def test_non_ascii_falls_back():
    assert native_jaro_winkler("héllo", "hello") is None
    # the public kernel still answers via the Python path
    assert sim.jaro_winkler("héllo", "héllo") == 1.0


def test_overlong_falls_back():
    long_a = "A" * 2000
    long_b = "A" * 1999 + "B"  # unequal: bypasses the memcmp shortcut
    assert native_jaro_winkler(long_a, long_b) is None
    assert sim.jaro_winkler(long_a, long_b) == _py_jw(long_a, long_b)
    # equal over-long strings legitimately short-circuit to 1.0
    assert native_jaro_winkler(long_a, long_a) == 1.0
