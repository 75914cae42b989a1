"""Unit tests for scalar similarity kernels (no Spark needed).

Expected values are hand-computed from the published algorithm definitions
(classic Jaro-Winkler literature pairs; difflib stdlib; set algebra for
Jaccard), pinning the exact semantics the reference engine relies on
(/root/reference/snowflake/11_ensemble_udfs.sql).
"""

import math
from difflib import SequenceMatcher

import pytest

from payor_mdm_spark.functions import similarity as sim
from payor_mdm_spark.functions.phonetic import double_metaphone, phonetic_equal


class TestJaroWinkler:
    # Canonical pairs from the Jaro/Winkler literature.
    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("MARTHA", "MARHTA", 0.9611111111111111),
            ("DWAYNE", "DUANE", 0.84),
            ("DIXON", "DICKSONX", 0.8133333333333332),
            ("ABC", "ABC", 1.0),
            ("ABC", "XYZ", 0.0),
        ],
    )
    def test_known_pairs(self, a, b, expected):
        assert sim.jaro_winkler(a, b) == pytest.approx(expected, abs=1e-12)

    def test_boost_only_above_07(self):
        # jaro <= 0.7 -> no prefix boost applied
        a, b = "ABCDEFG", "ABZZZZZZZZZZZ"
        j = sim.jaro(a, b)
        if j <= 0.7:
            assert sim.jaro_winkler(a, b) == j

    def test_none_propagates(self):
        assert sim.jaro_winkler(None, "X") is None


class TestTokenSortRatio:
    def test_sorted_tokens_equal(self):
        assert sim.token_sort_ratio("BLUE CROSS", "CROSS BLUE") == 1.0

    def test_matches_difflib(self):
        a, b = "AETNA HEALTH PLANS", "AETNA HEALTH"
        sa = " ".join(sorted(a.split()))
        sb = " ".join(sorted(b.split()))
        assert sim.token_sort_ratio(a, b) == round(
            SequenceMatcher(None, sa, sb).ratio(), 4
        )


class TestTrigramCosine:
    def test_identical(self):
        assert sim.trigram_cosine("AETNA", "AETNA") == 1.0

    def test_disjoint(self):
        assert sim.trigram_cosine("AAAA", "BBBB") == 0.0

    def test_hand_computed(self):
        # ABCD -> {ABC, BCD}; ABCE -> {ABC, BCE}; cosine = 1/2
        assert sim.trigram_cosine("ABCD", "ABCE") == pytest.approx(0.5)

    def test_short_string_falls_back_to_whole(self):
        assert sim.trigram_cosine("AB", "AB") == 1.0


class TestAbbrevExpansion:
    def test_bcbs_expands(self):
        assert sim.expand_abbrevs("BCBS OF TEXAS") == "BLUE CROSS BLUE SHIELD OF TEXAS"

    def test_abr_score_equal_after_expansion(self):
        assert sim.name_abr("BCBS OF TEXAS", "BLUE CROSS BLUE SHIELD OF TEXAS") == 1.0


class TestAddr:
    def test_jaccard_stopwords_removed(self):
        # {123, MAIN} vs {123, MAIN} after ST/STREET stop removal
        assert sim.addr_jaccard("123 MAIN ST", "123 MAIN STREET") == 1.0

    def test_jaccard_partial(self):
        # {1, A} vs {1, B}: intersection 1, union 3
        assert sim.addr_jaccard("1 A", "1 B") == pytest.approx(round(1 / 3, 4))

    def test_component_exact(self):
        assert sim.addr_component("123 MAIN ST", "123 MAIN STREET") == 1.0

    def test_component_no_number(self):
        # falls back to name-only component (weight renormalized)
        assert sim.addr_component("MAIN PLAZA", "MAIN PLAZA") == 1.0

    def test_usps_normalize(self):
        assert sim.usps_normalize("123 MAIN STREET SUITE 4") == "123 MAIN ST STE 4"

    def test_normalized_score_exact_after_norm(self):
        assert sim.addr_normalized("123 MAIN STREET", "123 MAIN ST") == 1.0

    def test_zip_blend(self):
        assert sim.addr_zip_blend("1 A", "1 A", "94105", "94105") == 1.0
        assert sim.addr_zip_blend("1 A", "1 A", "94105", "94199") == pytest.approx(0.75)
        assert sim.addr_zip_blend(None, None, "94105", None) is None


class TestDigitKernels:
    def test_taxid_exact(self):
        assert sim.taxid_exact("12-3456789", "123456789") == 1.0
        assert sim.taxid_exact("123456789", "123456780") == 0.0
        assert sim.taxid_exact(None, "1") is None

    def test_taxid_transpose(self):
        assert sim.taxid_transpose("123456789", "123456789") == 1.0
        assert sim.taxid_transpose("123456789", "123456780") == 0.9  # 1 diff
        assert sim.taxid_transpose("123456789", "123456879") == 0.7  # swap = 2 diffs
        assert sim.taxid_transpose("123456789", "987654321") == 0.0
        assert sim.taxid_transpose("12345", "123456") == 0.0  # length mismatch

    def test_taxid_prefix(self):
        assert sim.taxid_prefix("123456789", "123456789") == 0.6
        assert sim.taxid_prefix("12999<?>9999", "129999999") in (0.6, 0.3)
        assert sim.taxid_prefix("993456789", "123456789") == 0.0
        assert sim.taxid_prefix("1234", "12345") is None

    def test_phone_e164(self):
        assert sim.phone_e164("(415) 555-1234", "14155551234") == 1.0
        assert sim.phone_e164("555-1234", "5551234") == 1.0  # 7-digit fallback
        assert sim.phone_e164("4155551234", "5105551234") == 0.0

    def test_phone_last7_and_areacode(self):
        assert sim.phone_last7("4155551234", "5105551234") == 1.0
        assert sim.phone_areacode("4155551234", "4155559934") == 0.3
        assert sim.phone_areacode("4155551234", "4155551234") == 0.8

    def test_cms(self):
        assert sim.cms_exact(" h1234-001 ", "H1234-001") == 1.0
        assert sim.cms_prefix("H1234-001", "H1234-002") == 0.85
        assert sim.cms_prefix("H1", "H1234") == 0.0


class TestDoubleMetaphone:
    @pytest.mark.parametrize(
        "a,b",
        [
            ("SMITH", "SMYTH"),
            ("CATHERINE", "KATHRYN"),
            ("AETNA", "ETNA"),
            ("JOHNSON", "JONSON"),
            ("CIGNA", "SIGNA"),
        ],
    )
    def test_phonetic_pairs_match(self, a, b):
        assert phonetic_equal(a, b) == 1.0

    @pytest.mark.parametrize("a,b", [("AETNA", "HUMANA"), ("KAISER", "CIGNA")])
    def test_phonetic_pairs_differ(self, a, b):
        assert phonetic_equal(a, b) == 0.0

    def test_empty(self):
        assert double_metaphone("") == ("", "")
        assert phonetic_equal(None, "X") == 0.0

    def test_deterministic(self):
        assert double_metaphone("BLUE CROSS") == double_metaphone("BLUE CROSS")
