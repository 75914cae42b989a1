"""Transcript rollup: turn rows -> one canonical record per conv_id.

The graft analog of the reference's RAW->STAGING landing step: one
conversation plays the role of one source record
(/root/reference/snowflake/03_create_raw_tables.sql feeds; SURVEY §1.4).

Invariants (BASELINE.json input_hint):
* stable turn ordering — turns are packed as an array of structs sorted by
  (turn_idx) with deterministic tie-breaks (role, text);
* per-turn text equality — the text of every turn is preserved verbatim in
  the packed array (tested by tests/test_rollup.py round-trip).

Scale notes: the rollup is ONE shuffle (groupBy conv_id). Field extraction
regexes run map-side *before* the shuffle so the aggregation carries only
small extracted values plus the packed turns array. At the 10^12-turn design
point the input Iceberg table is bucketed by conv_id, which turns this into
a shuffle-free partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Template<->extractor contract with datagen/transcripts.py (the analog of
# the reference generator's fixed CSV schemas). Each regex runs map-side in
# WholeStageCodegen.
_EXTRACTORS: dict[str, tuple[str, int]] = {
    # column -> (regex over text, group index)
    "name_raw": (r"(?:calling about|representative of|inquiry for) (.*)\.$", 1),
    "exact_key_1_raw": (r"(?:tax id is|EIN on file is) ([0-9-]+)\.", 1),
    "addr_full_raw": (r"(?:located at|address on file is) (.*)\.$", 1),
    "phone_raw": (r"(?:reach us at|call) ([0-9+().\- ]+?)(?: for billing)?\.$", 1),
    "name_alt_raw": (r"business as (.*)\.$", 1),
    "status_raw": (r"plan is currently (active|inactive|terminated)\.", 1),
    "effective_raw": (r"effective since ([0-9]{4}-[0-9]{2}-[0-9]{2})\.", 1),
    "parent_ref_raw": (r"parent organization is (.*)\.$", 1),
}

_TOOL_KEY_RE = r"^[a-z_]+:(.*)$"


def rollup_conversations(turns: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) -> one row per conv_id.

    Output: conv_id, turns (array<struct> sorted by turn_idx), n_turns,
    loaded_at (max ts), opener_text, extracted *_raw fields, tool_key_raw.
    """
    df = turns
    for col, (pattern, group) in _EXTRACTORS.items():
        extracted = F.regexp_extract(F.col("text"), pattern, group)
        df = df.withColumn(col, F.nullif(extracted, F.lit("")))
    # name must come from the opener turn only (turn_idx == 0)
    df = df.withColumn(
        "name_raw", F.when(F.col("turn_idx") == 0, F.col("name_raw"))
    )
    df = df.withColumn(
        "tool_key_raw",
        F.nullif(F.regexp_extract(F.col("tool"), _TOOL_KEY_RE, 1), F.lit("")),
    )

    turn_struct = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"), F.col("ts")
    )
    agg_first = [
        F.max(c).alias(c)
        for c in [
            "name_raw", "exact_key_1_raw", "addr_full_raw", "phone_raw",
            "name_alt_raw", "status_raw", "effective_raw", "parent_ref_raw",
            "tool_key_raw",
        ]
    ]
    rolled = (
        df.groupBy("conv_id")
        .agg(
            # sort_array over struct sorts by field order: turn_idx first ->
            # stable turn ordering with deterministic tie-breaks.
            F.sort_array(F.collect_list(turn_struct)).alias("turns"),
            F.count(F.lit(1)).alias("n_turns"),
            F.max("ts").alias("loaded_at"),
            *agg_first,
        )
    )
    return rolled
