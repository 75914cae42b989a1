"""Legacy v1 scoring kernel (FUZZY_SCORE).

Mirrors /root/reference/snowflake/08_fuzzy_udf.sql:14-83 — the pre-ensemble
kernel: name Jaro-Winkler, exact tax, lowercase token-Jaccard address,
last-7 phone, exact cms, weights .35/.25/.20/.10/.10 renormalized over
present fields, composite rounded to 4 dp.

Superseded by the ensemble router (no model calls it;
int_match_scored.sql:34 calls ENSEMBLE_MATCH_SCORE) — kept for UDF-surface
parity and as the unit-test oracle for the shared weighting logic
(SURVEY §2.8 U19).
"""

from __future__ import annotations

from payor_mdm_spark.functions.similarity import jaro_winkler

_V1_STOPS = frozenset(
    {
        "st", "street", "ave", "avenue", "blvd", "boulevard", "rd", "road",
        "dr", "drive", "ln", "lane", "ct", "court", "ste", "suite", "apt",
        "unit", "fl", "floor", "#",
    }
)


def fuzzy_score_v1(
    name_a: str | None, name_b: str | None,
    tax_a: str | None, tax_b: str | None,
    addr_a: str | None, addr_b: str | None,
    phone_a: str | None, phone_b: str | None,
    cms_a: str | None, cms_b: str | None,
) -> dict:
    scores: dict[str, float] = {}
    weights: dict[str, float] = {}

    if name_a and name_b:
        scores["name"] = jaro_winkler(name_a.upper().strip(), name_b.upper().strip())
        weights["name"] = 0.35
    if tax_a and tax_b:
        scores["tax_id"] = 1.0 if tax_a.strip() == tax_b.strip() else 0.0
        weights["tax_id"] = 0.25
    if addr_a and addr_b:
        ta = {t.lower().rstrip(".,") for t in addr_a.split()} - _V1_STOPS
        tb = {t.lower().rstrip(".,") for t in addr_b.split()} - _V1_STOPS
        union = ta | tb
        scores["address"] = len(ta & tb) / len(union) if union else 0.0
        weights["address"] = 0.20
    if phone_a and phone_b:
        pa = "".join(c for c in phone_a if c.isdigit())
        pb = "".join(c for c in phone_b if c.isdigit())
        scores["phone"] = (
            1.0 if len(pa) >= 7 and len(pb) >= 7 and pa[-7:] == pb[-7:] else 0.0
        )
        weights["phone"] = 0.10
    if cms_a and cms_b:
        scores["cms_plan_id"] = (
            1.0 if cms_a.strip().upper() == cms_b.strip().upper() else 0.0
        )
        weights["cms_plan_id"] = 0.10

    total = sum(weights.values())
    composite = sum(scores[k] * weights[k] for k in scores) / total if total > 0 else 0.0
    result = dict(scores)
    result["composite"] = round(composite, 4)
    return result
