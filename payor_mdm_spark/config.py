"""Engine configuration: rules-as-data tables mirrored from the reference.

The reference keeps these as seeded tables / UDF-embedded dicts:
  * abbreviation dictionary — /root/reference/snowflake/11_ensemble_udfs.sql:434-443
    (also seeded as a table, 12_abbreviation_dict.sql:49-75)
  * address stopwords — 11_ensemble_udfs.sql:445-447
  * USPS street norms — 11_ensemble_udfs.sql:449-453
  * ensemble field weights — 11_ensemble_udfs.sql:638
  * decision thresholds — transform/.../match/match_candidates.sql:33-39
  * survivorship rule families — snowflake/07_seed_survivorship_config.sql

They are semantic *data*, not code; we keep them in one module so the scorer,
the generator, and the tests share a single source of truth.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Abbreviation dictionary (token -> expansion), used by the NAME_ABR strategy
# and by the router's has-abbrev test. Reference: 11_ensemble_udfs.sql:434-443.
# ---------------------------------------------------------------------------
ABBREVS: dict[str, str] = {
    "BCBS": "BLUE CROSS BLUE SHIELD",
    "BC": "BLUE CROSS",
    "BS": "BLUE SHIELD",
    "UHC": "UNITEDHEALTHCARE",
    "UHG": "UNITEDHEALTH GROUP",
    "HCSC": "HEALTH CARE SERVICE CORPORATION",
    "KP": "KAISER PERMANENTE",
    "KFHP": "KAISER FOUNDATION HEALTH PLAN",
    "HMO": "HEALTH MAINTENANCE ORGANIZATION",
    "PPO": "PREFERRED PROVIDER ORGANIZATION",
    "EPO": "EXCLUSIVE PROVIDER ORGANIZATION",
    "POS": "POINT OF SERVICE",
    "MVP": "MVP HEALTH CARE",
    "HAP": "HEALTH ALLIANCE PLAN",
    "PHP": "PHYSICIANS HEALTH PLAN",
    "QHP": "QUALIFIED HEALTH PLAN",
    "FEHB": "FEDERAL EMPLOYEES HEALTH BENEFITS",
    "CCHP": "CHINESE COMMUNITY HEALTH PLAN",
}

# Address token stopwords (11_ensemble_udfs.sql:445-447).
ADDR_STOPS: frozenset[str] = frozenset(
    {
        "ST", "STREET", "AVE", "AVENUE", "BLVD", "BOULEVARD", "RD", "ROAD",
        "DR", "DRIVE", "LN", "LANE", "CT", "COURT", "STE", "SUITE", "APT",
        "UNIT", "FL", "FLOOR", "#",
    }
)

# USPS-style street normalization map (11_ensemble_udfs.sql:449-453).
STREET_NORMS: dict[str, str] = {
    "STREET": "ST", "AVENUE": "AVE", "BOULEVARD": "BLVD", "ROAD": "RD",
    "DRIVE": "DR", "LANE": "LN", "COURT": "CT", "PLACE": "PL",
    "CIRCLE": "CIR", "TERRACE": "TER", "NORTH": "N", "SOUTH": "S",
    "EAST": "E", "WEST": "W", "NORTHEAST": "NE", "NORTHWEST": "NW",
    "SOUTHEAST": "SE", "SOUTHWEST": "SW", "SUITE": "STE",
    "APARTMENT": "APT",
}

# Ensemble composite weights per field (11_ensemble_udfs.sql:638); the
# composite is renormalized over the fields present on a given pair.
FIELD_WEIGHTS: dict[str, float] = {
    "name": 0.35,
    "exact_key_1": 0.25,   # tax_id analog
    "address": 0.20,
    "phone": 0.10,
    "exact_key_2": 0.10,   # cms_plan_id analog
}

# Decision thresholds (match_candidates.sql:33-39).
AUTO_MATCH_THRESHOLD = 0.85
REVIEW_THRESHOLD = 0.60
# Borderline-automatch second factor (precision-tail calibration): FUZZY
# scores in [AUTO_MATCH_THRESHOLD, BORDERLINE_GEO_CEILING) additionally
# require NO geographic contradiction (state, city, or zip5 both known and
# different) to auto-match — they demote to review otherwise. Evidence
# (tools/analyze_fp.py, n=10k/30k/100k worlds): every cross-entity FUZZY
# edge sits in this band AND carries a geographic contradiction (at n=100k
# all 18 residual FUZZY FPs were same-city name twins with differing zips),
# while zero same-entity edges in the band do (every one scored exactly 1.0
# on address), so the gate removes the FP tail at no recall cost.
BORDERLINE_GEO_CEILING = 0.93

# Exact-identifier second factor: a DET-1/DET-2 pair (identical tax-id /
# cms-id analog) normally auto-matches at 1.0, but an identifier can
# collide across unrelated organizations (typo, reuse, default value — and
# at 10^8+ records, birthday collisions in a 9-digit id space are
# *expected*: the n=100k world produced 39 such cross-entity DET edges).
# When the pair's OTHER evidence contradicts — a geographic contradiction
# AND a name score below this floor (i.e. the name alone would not clear
# the fuzzy auto-match bar) — the pair demotes to review instead. Measured
# (tools/analyze_fp.py, n=100k): catches all 39 collision edges, touches 0
# same-entity edges (every true DET pair scored ≥0.92 on name OR agreed on
# geography). DET-3 (same name + same state) is structurally immune: its
# name score is 1.0. Legacy frames without the geo column keep the
# reference's unconditional DET auto-match (match_candidates.sql:33-39).
DET_NAME_FLOOR = AUTO_MATCH_THRESHOLD

# Kill-switches for the two documented divergences from the reference's
# plain-threshold decision semantics (match_candidates.sql:33-39). Both
# gates are calibrated on synthetic seed-42 worlds only (ADVICE r04); on a
# real distribution where a shared identifier with a renamed+relocated org
# is legitimate, flip ENABLE_DET_GATE off to restore the reference's
# unconditional DET auto-match, and re-validate DET_NAME_FLOOR before
# re-enabling. Read at build_candidates() call time (not import time) so a
# deployment can toggle them without re-importing the package.
ENABLE_GEO_GATE = True
ENABLE_DET_GATE = True

# Legal-suffix strip pattern for name normalization
# (stg_crm_payors.sql:17-26; Snowflake 'i' flag -> inline (?i)).
LEGAL_SUFFIX_PATTERN = (
    r"(?i)\s*(,\s*)?(INC\.?|LLC\.?|CORP\.?|CO\.?|LTD\.?"
    r"|L\.?P\.?|L\.?L\.?C\.?|P\.?C\.?)\s*$"
)

# Source trust ranks (stg_*_payors.sql trailing literals: crm=1 claims=2
# credentialing=3 cms_reference=4).
SOURCE_TRUST_RANK: dict[str, int] = {
    "crm": 1,
    "claims": 2,
    "credentialing": 3,
    "cms_reference": 4,
}

# Blocking defaults (stg_payors_unioned.sql:42-51 + scale additions).
BLOCK_NAME_PREFIX_LEN = 6
BLOCK_ZIP3_NAME_PREFIX_LEN = 4
NULL_STATE_FILL = "XX"
NULL_ZIP3_FILL = "XXX"
# Scale knobs: blocks larger than this are salted / capped before the
# pairwise self-join (north_rule: explicit hot-key handling).
MAX_BLOCK_SIZE = 200
SORTED_NEIGHBORHOOD_WINDOW = 5
# 4 bands x 8 rows -> LSH candidate threshold ~(1/4)^(1/8) ~= 0.84 shingle
# Jaccard. Same-entity name variants (suffix strips, punct mess) sit >0.85;
# cross-entity shared-suffix names ("X HEALTH PLAN OF TEXAS") sit ~0.5-0.65
# and stay out — measured 7x candidate-pair reduction at bench scale with
# unchanged pairwise F1. Abbreviation-form variants (BCBS vs spelled-out,
# Jaccard ~0.3) are covered by the dedicated block_abbr_key pass instead.
MINHASH_NUM_HASHES = 32
MINHASH_BANDS = 4
MINHASH_SHINGLE_K = 3

# Survivorship rule families (07_seed_survivorship_config.sql): field ->
# rule. Rules: source_priority | cms_reference_first | most_recent |
# most_complete | any_true | min | max.
SURVIVORSHIP_RULES: dict[str, str] = {
    "name_raw": "source_priority",
    "exact_key_1": "source_priority",
    "npi": "source_priority",
    "website": "source_priority",
    "entity_type": "source_priority",
    "line_of_business": "source_priority",
    "exact_key_2": "cms_reference_first",
    "addr_line_1": "most_recent",
    "addr_line_2": "most_recent",
    "city": "most_recent",
    "state_code": "most_recent",
    "zip_code": "most_recent",
    "phone": "most_recent",
    "name_alt": "most_complete",
    "is_active": "any_true",
    "effective_date": "min",
    "termination_date": "max",
}

# Full-state-name -> 2-letter code map. The reference staging layer joins a
# 51-row inline VALUES lookup to normalize claims-feed state names
# (stg_claims_payors.sql:2-18,99-100, operator P10); we broadcast-join the
# same map built from this dict.
STATE_NAME_TO_CODE: dict[str, str] = {
    "ALABAMA": "AL", "ALASKA": "AK", "ARIZONA": "AZ", "ARKANSAS": "AR",
    "CALIFORNIA": "CA", "COLORADO": "CO", "CONNECTICUT": "CT",
    "DELAWARE": "DE", "FLORIDA": "FL", "GEORGIA": "GA", "HAWAII": "HI",
    "IDAHO": "ID", "ILLINOIS": "IL", "INDIANA": "IN", "IOWA": "IA",
    "KANSAS": "KS", "KENTUCKY": "KY", "LOUISIANA": "LA", "MAINE": "ME",
    "MARYLAND": "MD", "MASSACHUSETTS": "MA", "MICHIGAN": "MI",
    "MINNESOTA": "MN", "MISSISSIPPI": "MS", "MISSOURI": "MO",
    "MONTANA": "MT", "NEBRASKA": "NE", "NEVADA": "NV",
    "NEW HAMPSHIRE": "NH", "NEW JERSEY": "NJ", "NEW MEXICO": "NM",
    "NEW YORK": "NY", "NORTH CAROLINA": "NC", "NORTH DAKOTA": "ND",
    "OHIO": "OH", "OKLAHOMA": "OK", "OREGON": "OR", "PENNSYLVANIA": "PA",
    "RHODE ISLAND": "RI", "SOUTH CAROLINA": "SC", "SOUTH DAKOTA": "SD",
    "TENNESSEE": "TN", "TEXAS": "TX", "UTAH": "UT", "VERMONT": "VT",
    "VIRGINIA": "VA", "WASHINGTON": "WA", "WEST VIRGINIA": "WV",
    "WISCONSIN": "WI", "WYOMING": "WY", "DISTRICT OF COLUMBIA": "DC",
}

# Fields participating in the golden completeness score
# (golden_payors.sql:44-70: 15 fields / 15.0).
COMPLETENESS_FIELDS: tuple[str, ...] = (
    "name_raw", "name_alt", "exact_key_1", "npi", "exact_key_2",
    "addr_line_1", "city", "state_code", "zip_code", "phone",
    "website", "entity_type", "line_of_business", "is_active",
    "effective_date",
)
