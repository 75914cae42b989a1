"""Standardization kernels as pure native column expressions.

Mirrors the reference staging layer's scalar surface (SURVEY §2.2, P1-P13;
/root/reference/transform/payor_mdm/models/staging/*.sql). Everything here
stays JVM-side inside WholeStageCodegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from payor_mdm_spark.config import (
    BLOCK_NAME_PREFIX_LEN,
    BLOCK_ZIP3_NAME_PREFIX_LEN,
    LEGAL_SUFFIX_PATTERN,
    NULL_STATE_FILL,
    NULL_ZIP3_FILL,
)


def clean_name(col: Column) -> Column:
    """upper(trim(strip legal suffix)) — stg_crm_payors.sql:17-26 (P3).

    Snowflake's regexp_replace(..., 1, 1, 'i') becomes an inline (?i) flag;
    the pattern anchors at end-of-string so a single replacement is
    equivalent.
    """
    return F.upper(F.trim(F.regexp_replace(col, LEGAL_SUFFIX_PATTERN, "")))


def digits_only(col: Column) -> Column:
    """Strip non-digits — tax_id/phone/zip scrub (stg_crm_payors.sql:30, P4)."""
    return F.regexp_replace(col, "[^0-9]", "")


def nullif_empty(col: Column) -> Column:
    return F.nullif(F.trim(col), F.lit(""))


def zip5(col: Column) -> Column:
    """First 5 digits (stg_crm_payors.sql:39, P5)."""
    return nullif_empty(F.substring(digits_only(col), 1, 5))


def zip_plus4(col: Column) -> Column:
    """Digits 6-9 when present (stg_crm_payors.sql:40-43, P8)."""
    d = digits_only(col)
    return F.when(F.length(d) > 5, F.substring(d, 6, 4))


def phone10(col: Column) -> Column:
    return nullif_empty(digits_only(col))


def state2(col: Column) -> Column:
    """upper(left(trim(state),2)) (stg_crm_payors.sql:38)."""
    return F.upper(F.substring(F.trim(col), 1, 2))


def source_record_id(source_tag: Column | str, source_id: Column) -> Column:
    """'{source}:{id}' identity scheme (stg_crm_payors.sql:11, P1)."""
    tag = F.lit(source_tag) if isinstance(source_tag, str) else source_tag
    return F.concat(tag, F.lit(":"), source_id)


def try_to_date(col: Column) -> Column:
    """Lenient date cast (stg_crm_payors.sql:56, P9)."""
    return F.try_to_timestamp(col).cast("date")


def block_name_key(name_clean: Column, state_code: Column) -> Column:
    """left(name,6) || coalesce(state,'XX') (stg_payors_unioned.sql:43-44)."""
    return F.concat(
        F.substring(F.coalesce(name_clean, F.lit("")), 1, BLOCK_NAME_PREFIX_LEN),
        F.coalesce(state_code, F.lit(NULL_STATE_FILL)),
    )


def block_zip3_name4(zip_code: Column, name_clean: Column) -> Column:
    """coalesce(left(zip,3),'XXX') || left(name,4) (stg_payors_unioned.sql:50-51)."""
    return F.concat(
        F.coalesce(F.substring(zip_code, 1, 3), F.lit(NULL_ZIP3_FILL)),
        F.substring(F.coalesce(name_clean, F.lit("")), 1, BLOCK_ZIP3_NAME_PREFIX_LEN),
    )


def expand_abbrevs_col(col: Column) -> Column:
    """Token-wise abbreviation expansion as a native expression (the
    blocking-level analog of the NAME_ABR strategy, 11_ensemble_udfs.sql:
    89-91): BCBS -> BLUE CROSS BLUE SHIELD etc., map shipped as a literal
    create_map (18 entries — folds into codegen)."""
    from payor_mdm_spark.config import ABBREVS

    amap = F.create_map(*[F.lit(x) for kv in ABBREVS.items() for x in kv])
    return F.array_join(
        F.transform(F.split(col, " "), lambda t: F.coalesce(amap[t], t)), " "
    )


def block_abbr_key(name_norm: Column, state_code: Column) -> Column:
    """Abbreviation-expanded name-prefix blocking key.

    Closes the recall hole the reference leaves open: 'BCBS OF TEXAS' and
    'BLUE CROSS BLUE SHIELD OF TEXAS' share NO reference blocking key when
    the exact key is absent (name prefixes differ, zip3+name4 differs) and
    their shingle Jaccard (~0.3) is below any sane LSH threshold — but they
    collide here after expansion."""
    return F.concat(
        F.substring(expand_abbrevs_col(F.coalesce(name_norm, F.lit(""))), 1, BLOCK_NAME_PREFIX_LEN),
        F.coalesce(state_code, F.lit(NULL_STATE_FILL)),
    )


def deterministic_id(*cols: Column) -> Column:
    """Content-derived id: md5 over '|'-joined parts.

    Replaces the reference's nondeterministic uuid_string()
    (match_candidates.sql:15) — deterministic ids are required for golden
    fixtures and snapshot resume (SURVEY §1.3).
    """
    return F.md5(F.concat_ws("|", *cols))


def md5_60bit(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    Used where a value oracle matters more than raw hash speed (SimHash
    token hashes, document fingerprints): DuckDB reproduces it exactly as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``, so the driver can
    value-check those operators instead of rows-only. 60 bits keeps the
    value positive in a signed 64-bit long on both engines.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
