"""Deterministic transcript-world generator with ground-truth entity labels.

Mirrors the reference's test-harness design (SURVEY §5;
/root/reference/generator/generate_payors.py + mess_patterns.py): a seeded
world of canonical entities organized into families, each emitted as 1-4
*conversations* across four source feeds (trust ranks 1-4) with
source-specific "mess" (name variants incl. abbreviation forms, legal
suffixes, address abbreviation, full-vs-code state names, zip+4, phone
formats, tax-id transposition typos, nulls, stale status), plus
within-source duplicates, orphans, and parent/child confusion records.

The graft payload is transcripts, so each source *record* is a multi-turn
conversation `(conv_id, turn_idx, role, text, tool, ts)` whose turns carry
the entity's fields in templated utterances; the staging layer extracts and
standardizes them (operators/staging.py documents the template<->extractor
contract). A ground-truth sidecar maps conv_id -> entity_id for pairwise-F1
evaluation; the engine never reads it.

Everything is derived from random.Random(seed) — no wall clock, no external
data. Scales from ~65 entities (fixture) to millions (bench) by extending
the curated families with numbered synthetic families.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from payor_mdm_spark.config import STATE_NAME_TO_CODE

SOURCES = ("crm", "claims", "credentialing", "cms_reference")
SOURCE_PROBS = {"crm": 0.90, "claims": 0.80, "credentialing": 0.60, "cms_reference": 0.40}

LEGAL_SUFFIXES = ["Inc.", "Inc", "LLC", "Corp.", "Corporation", "Co.", "L.P.", "Ltd."]
BCBS_FORMS = [
    "Blue Cross Blue Shield",
    "BlueCross BlueShield",
    "BCBS",
    "Blue Cross / Blue Shield",
    "Blue Cross and Blue Shield",
]

_STATES = sorted(set(STATE_NAME_TO_CODE.values()))
_CODE_TO_NAME = {v: k.title() for k, v in STATE_NAME_TO_CODE.items()}

_CITY_WORDS = [
    "Springfield", "Riverton", "Oakdale", "Fairview", "Georgetown", "Clayton",
    "Madison", "Ashland", "Dayton", "Franklin", "Greenville", "Bristol",
    "Clinton", "Salem", "Auburn", "Milton", "Dover", "Hudson", "Newport",
    "Lexington",
]
_STREET_NAMES = [
    "Maple", "Oak", "Cedar", "Elm", "Pine", "Washington", "Lake", "Hill",
    "Park", "Main", "Walnut", "Sunset", "Railroad", "Jefferson", "River",
    "Spring", "Willow", "Meadow", "Forest", "Highland",
]
_STREET_TYPES = ["Street", "Avenue", "Boulevard", "Drive", "Road", "Lane"]
# syllables for faker-style diverse street/city words — the reference uses
# faker street addresses; a tiny fixed vocabulary would make unrelated
# addresses look ~0.7-JW-similar and (with tax+phone both absent) push
# unrelated sibling names over the 0.85 composite threshold
_SYLLABLES = [
    "bar", "den", "fel", "gor", "ham", "kin", "lor", "mer", "nor", "pel",
    "quin", "ros", "sil", "tor", "ul", "ver", "wex", "yor", "zan", "cal",
    "dov", "ash", "bri", "cla", "oak", "thorn", "wick", "stan", "graf", "mil",
]
_CITY_SUFFIX = ["ton", "ville", "burg", "field", "port", "dale", "ford", "haven"]


def _mk_word(rng: random.Random, n_syllables: int = 2) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(n_syllables)).capitalize()


def _mk_city(rng: random.Random) -> str:
    return _mk_word(rng, 2) + rng.choice(_CITY_SUFFIX)
_STREET_ABBREVS = {
    "Street": ["St", "St.", "Str"],
    "Avenue": ["Ave", "Ave.", "Av"],
    "Boulevard": ["Blvd", "Blvd."],
    "Drive": ["Dr", "Dr."],
    "Road": ["Rd", "Rd."],
    "Suite": ["Ste", "Ste.", "STE", "#"],
}
_ORG_ADJ = [
    "Lakeside", "Summit", "Harbor", "Pioneer", "Evergreen", "Cascade",
    "Liberty", "Beacon", "Granite", "Prairie", "Sterling", "Horizon",
    "Redwood", "Atlantic", "Pacific", "Heartland", "Keystone", "Frontier",
    "Monarch", "Titan", "Vanguard", "Crescent", "Ridgeline", "Bluebird",
]
_ORG_NOUN = [
    "Health Plan", "Health Partners", "Care Network", "Mutual Health",
    "Benefit Group", "Health Alliance", "Wellness Group", "Health Services",
    "Care Alliance", "Assurance Group",
]
_ORG_GEO = [
    "Northern", "Southern", "Eastern", "Western", "Central", "Coastal",
    "Valley", "Mountain", "Lakeshore", "Riverside", "Gulf", "Midland",
    "Highland", "Lowland", "Upland", "Greater", "Metro", "Inland",
    "Bayside", "Piedmont", "Plains", "Delta", "Cascadian", "Canyon",
    "Prairieland",
]

# Curated families exercising the abbreviation router branch (names built
# from the shared ABBREVS vocabulary in config.py) and parent/child
# hierarchy inference.
_CURATED_FAMILIES: list[dict] = [
    {"parent": "Blue Cross Blue Shield Association", "children_base": "Blue Cross Blue Shield", "states": ["TX", "IL", "MI", "AL"], "bcbs": True},
    {"parent": "UnitedHealth Group", "children": ["UnitedHealthcare of California", "UnitedHealthcare Community Plan", "UnitedHealthcare of Texas"]},
    {"parent": "Kaiser Foundation Health Plan", "children": ["Kaiser Permanente of Georgia", "Kaiser Permanente Northwest"]},
    {"parent": "Health Care Service Corporation", "children": ["HCSC of Oklahoma", "HCSC of Montana"]},
    {"parent": None, "children": ["MVP Health Care", "MVP Health Plan of New York"]},
    {"parent": None, "children": ["Health Alliance Plan of Michigan"]},
    {"parent": None, "children": ["Physicians Health Plan of Indiana"]},
    {"parent": None, "children": ["Chinese Community Health Plan"]},
]


@dataclass
class Entity:
    entity_id: int
    family_id: str
    name: str
    tax_id: str | None
    state: str
    city: str
    address: str
    zip: str
    phone: str
    website: str | None
    entity_type: str
    lob: str
    is_parent: bool
    parent_name: str | None
    is_active: bool
    effective_date: str  # ISO date
    dba: str | None
    cms_plan_id: str | None
    npi: str | None


@dataclass
class World:
    """Generated world: transcript turn rows + ground-truth sidecar."""

    turns: list[dict] = field(default_factory=list)
    truth: list[dict] = field(default_factory=list)  # conv-level labels
    entities: list[Entity] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Mess injectors (source-specific, mirroring mess_patterns.py behaviors)
# ---------------------------------------------------------------------------

def _name_variant(rng: random.Random, name: str, source: str) -> str:
    r = rng.random()
    if source == "crm":
        if r < 0.3:
            suffix = rng.choice(LEGAL_SUFFIXES)
            return f"{name}, {suffix}" if r < 0.15 else f"{name} {suffix}"
        return name
    if source == "claims":
        n = name.upper()
        if r < 0.4:
            n = n.replace(",", "").replace(".", "")
        if r < 0.3 and "BLUE CROSS" in n:
            n = n.replace("BLUE CROSS BLUE SHIELD", rng.choice(BCBS_FORMS).upper())
        return n
    if source == "credentialing":
        if r < 0.2:
            return f"{name} Health Inc."
        if r < 0.35:
            return name.replace("Healthcare", "Health Care")
        return name
    if source == "cms_reference":
        if r < 0.15:
            return name.replace(", Inc.", "").replace(" Inc.", "").replace(" Inc", "")
        return name
    return name


def _address_variant(rng: random.Random, addr: str) -> str:
    r = rng.random()
    for full, abbrevs in _STREET_ABBREVS.items():
        if full in addr and r < 0.5:
            addr = addr.replace(full, rng.choice(abbrevs))
    return addr


def _state_variant(rng: random.Random, code: str, source: str) -> str:
    if source == "claims" and rng.random() < 0.4:
        return _CODE_TO_NAME.get(code, code)
    return code


def _zip_variant(rng: random.Random, zipc: str, source: str) -> str:
    r = rng.random()
    if r < 0.2:
        return f"{zipc}-{rng.randint(1000, 9999)}"  # zip+4
    if source == "claims" and r < 0.3 and zipc.startswith("0"):
        return zipc[1:]  # dropped leading zero
    return zipc


def _phone_variant(rng: random.Random, digits: str) -> str:
    a, b, c = digits[:3], digits[3:6], digits[6:]
    return rng.choice(
        [
            f"({a}) {b}-{c}",
            f"{a}-{b}-{c}",
            f"{a}.{b}.{c}",
            f"+1 {a} {b} {c}",
            digits,
        ]
    )


def _tax_variant(rng: random.Random, tax: str | None, source: str) -> str | None:
    if tax is None:
        return None
    r = rng.random()
    # transposition typo analog (claims feed, low probability)
    if source == "claims" and r < 0.05 and len(tax) >= 4:
        i = rng.randint(0, len(tax) - 2)
        tax = tax[:i] + tax[i + 1] + tax[i] + tax[i + 2 :]
    if r < 0.5:
        return f"{tax[:2]}-{tax[2:]}"
    return tax


def _maybe_null(rng: random.Random, value, p: float):
    return None if rng.random() < p else value


# ---------------------------------------------------------------------------
# Entity world construction
# ---------------------------------------------------------------------------

def _mk_tax(rng: random.Random) -> str:
    return f"{rng.randint(10, 99)}{rng.randint(1000000, 9999999)}"


def _mk_zip(rng: random.Random) -> str:
    return f"{rng.randint(501, 99950):05d}"


def _mk_phone(rng: random.Random) -> str:
    return f"{rng.randint(201, 989)}{rng.randint(200, 999)}{rng.randint(0, 9999):04d}"


def _mk_address(rng: random.Random) -> str:
    name = _mk_word(rng, 2) if rng.random() < 0.7 else rng.choice(_STREET_NAMES)
    return f"{rng.randint(100, 9999)} {name} {rng.choice(_STREET_TYPES)}"


def _synthetic_base(si: int) -> str:
    """Collision-free base name for synthetic family ``si`` from a geo x
    adj x noun grid (6,000 bases; a second geo prefix extends it to
    150,000; a numeric generation suffix beyond that — millions of
    families). Distinct entities get names that differ in at least one
    content WORD — matching the reference world, where distinct payors
    have materially distinct names (payor_families.json) — rather than
    digit-suffix near-clones whose pairwise similarity would grow
    adversarial with world size. Pure function of ``si`` (no rng), shared
    by the sequential and sharded generators."""
    geo = _ORG_GEO[si % len(_ORG_GEO)]
    adj = _ORG_ADJ[(si // len(_ORG_GEO)) % len(_ORG_ADJ)]
    noun = _ORG_NOUN[(si // (len(_ORG_GEO) * len(_ORG_ADJ))) % len(_ORG_NOUN)]
    gen = si // (len(_ORG_GEO) * len(_ORG_ADJ) * len(_ORG_NOUN))
    base = f"{geo} {adj} {noun}"
    if gen > 0:
        base = f"{_ORG_GEO[(gen - 1) % len(_ORG_GEO)]} {base}"
        if gen > len(_ORG_GEO):
            base = f"{base} {gen}"
    return base


def build_entities(rng: random.Random, n_entities: int = 65) -> list[Entity]:
    """Curated abbreviation/hierarchy families first, then numbered synthetic
    families until n_entities is reached."""
    entities: list[Entity] = []
    eid = 0

    def add(name: str, family_id: str, *, parent_name: str | None, is_parent: bool,
            tax: str | None, state: str | None = None, cms: str | None = None,
            dba: str | None = None) -> None:
        nonlocal eid
        eid += 1
        st = state or rng.choice(_STATES)
        entities.append(
            Entity(
                entity_id=eid,
                family_id=family_id,
                name=name,
                tax_id=tax,
                state=st,
                city=_mk_city(rng) if rng.random() < 0.7 else rng.choice(_CITY_WORDS),
                address=_mk_address(rng),
                zip=_mk_zip(rng),
                phone=_mk_phone(rng),
                website=(
                    "https://www."
                    + name.lower().replace(" ", "").replace(",", "").replace("/", "")[:20]
                    + ".com"
                ),
                entity_type=rng.choice(["commercial", "medicare", "medicaid", "exchange"]),
                lob=rng.choice(["PPO", "HMO", "EPO", "POS"]),
                is_parent=is_parent,
                parent_name=parent_name,
                is_active=rng.random() > 0.08,
                effective_date=f"{2000 + rng.randint(0, 20)}-{rng.randint(1, 12):02d}-01",
                dba=dba,
                cms_plan_id=cms,
                npi=f"1{rng.randint(100000000, 999999999)}" if rng.random() < 0.25 else None,
            )
        )

    for fi, fam in enumerate(_CURATED_FAMILIES):
        fam_id = f"fam-{fi:03d}"
        fam_tax = _mk_tax(rng)
        parent = fam.get("parent")
        if parent:
            add(parent, fam_id, parent_name=None, is_parent=True, tax=fam_tax)
        if fam.get("bcbs"):
            children = [f"{fam['children_base']} of {_CODE_TO_NAME[s]}" for s in fam["states"]]
        else:
            children = fam.get("children", [])
        for ch in children:
            cms = f"H{rng.randint(1000, 9999)}-{rng.randint(1, 99):03d}" if rng.random() < 0.5 else None
            dba = f"{ch.split(' of ')[0]}" if (" of " in ch and rng.random() < 0.3) else None
            # Distinct entities carry distinct tax ids: shared tax would
            # (correctly, per DET-1 semantics) merge them in the reference
            # pipeline too, which would poison the entity-label ground truth
            # used for pairwise F1 (see tools/eval_f1.py).
            add(ch, fam_id, parent_name=parent, is_parent=False,
                tax=_mk_tax(rng), cms=cms, dba=dba)
        if len(entities) >= n_entities:
            break

    si = 0
    while len(entities) < n_entities:
        fam_id = f"syn-{si:05d}"
        base = _synthetic_base(si)
        fam_tax = _mk_tax(rng)
        n_children = rng.randint(1, 3)
        parent_name = base if n_children > 1 and rng.random() < 0.4 else None
        if parent_name:
            add(parent_name, fam_id, parent_name=None, is_parent=True, tax=fam_tax)
        used_states: set[str] = {entities[-1].state} if parent_name else set()
        for _ in range(n_children):
            if len(entities) >= n_entities:
                break
            st = rng.choice([s for s in _STATES if s not in used_states])
            used_states.add(st)
            child = (
                f"{base} of {_CODE_TO_NAME[st]}" if (parent_name or n_children > 1) else base
            )
            cms = f"H{rng.randint(1000, 9999)}-{rng.randint(1, 99):03d}" if rng.random() < 0.4 else None
            add(child, fam_id, parent_name=parent_name, is_parent=False,
                tax=_mk_tax(rng), state=st, cms=cms)
        si += 1

    return entities


# ---------------------------------------------------------------------------
# Conversation synthesis
# ---------------------------------------------------------------------------

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

_ACKS = [
    "Understood, let me pull that up.",
    "Thanks, one moment while I check our records.",
    "Got it. I see the account here.",
    "Thank you for confirming.",
    "Noted. Anything else on this account?",
]

_TOOLS = ["plan_lookup", "account_search", "coverage_check"]


def _conversation(
    rng: random.Random,
    conv_id: str,
    source: str,
    ent: Entity,
    conv_seq: int,
    ensure_tax: bool = False,
) -> list[dict]:
    """Emit the turn rows for one conversation about one entity.

    ``ensure_tax``: skip the null-mess for tax (the reference generator
    explicitly sets the child's tax on parent/child-confusion records,
    generate_payors.py:282-291 — that anchor is what keeps the confusion
    trap separable from the parent)."""
    name = _name_variant(rng, ent.name, source)
    tax = _tax_variant(
        rng,
        ent.tax_id if ensure_tax else _maybe_null(rng, ent.tax_id, {"crm": 0.0, "claims": 0.15, "credentialing": 0.2, "cms_reference": 0.0}[source]),
        source,
    )
    addr = _address_variant(rng, ent.address)
    state = _state_variant(rng, ent.state, source)
    zipc = _zip_variant(rng, ent.zip, source)
    phone = _phone_variant(rng, ent.phone) if rng.random() > (0.2 if source == "credentialing" else 0.05) else None
    cms = ent.cms_plan_id
    dba = ent.dba or (ent.parent_name if rng.random() < 0.15 else None)

    opener = rng.choice(
        [
            f"Hi, I'm calling about {name}.",
            f"Hello, this is a representative of {name}.",
            f"Account inquiry for {name}.",
        ]
    )
    utterances: list[tuple[str, str | None]] = [(opener, None)]  # (text, tool)

    facts: list[tuple[str, str | None]] = []
    if tax:
        facts.append((rng.choice([f"Our tax id is {tax}.", f"The EIN on file is {tax}."]), None))
    if addr:
        if source == "claims":
            parts = [addr, ent.city, state, zipc]
            facts.append((f"The address on file is {', '.join(p for p in parts if p)}.", None))
        else:
            facts.append((f"We are located at {addr}, {ent.city}, {state} {zipc}.", None))
    if phone:
        facts.append((rng.choice([f"You can reach us at {phone}.", f"Please call {phone} for billing."]), None))
    if cms:
        facts.append((f"The plan id is {cms}.", f"{rng.choice(_TOOLS)}:{cms}"))
    if dba:
        facts.append((f"We also do business as {dba}.", None))
    if rng.random() < 0.5:
        status = "active" if ent.is_active else rng.choice(["inactive", "terminated"])
        facts.append((f"The plan is currently {status}.", None))
    if rng.random() < 0.4:
        facts.append((f"Coverage has been effective since {ent.effective_date}.", None))
    if ent.parent_name and rng.random() < 0.6:
        facts.append((f"Our parent organization is {ent.parent_name}.", None))
    rng.shuffle(facts)
    utterances.extend(facts)

    # Interleave assistant acknowledgments -> (role, text, tool) turn list.
    rows: list[dict] = []
    # Conversation timestamp: deterministic, later trust ranks load later so
    # `most_recent` survivorship is exercised; distinct per conversation.
    base = _BASE_TS + timedelta(
        days=ent.entity_id % 365,
        hours=SOURCES.index(source) * 6,
        minutes=conv_seq % 60,
    )
    turn_idx = 0
    for text, tool in utterances:
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": "user",
                "text": text,
                "tool": None,
                "ts": base + timedelta(seconds=30 * turn_idx),
            }
        )
        turn_idx += 1
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": "tool" if tool else "assistant",
                "text": _ACKS[(ent.entity_id + turn_idx) % len(_ACKS)],
                "tool": tool,
                "ts": base + timedelta(seconds=30 * turn_idx),
            }
        )
        turn_idx += 1
    return rows


def generate_world(
    seed: int = 42,
    n_entities: int = 65,
    orphan_range: tuple[int, int] = (5, 8),
    within_source_dup_p: float = 0.05,
    confusion_cap: int = 8,
) -> World:
    """Generate the full world (turn rows + ground truth sidecar)."""
    rng = random.Random(seed)
    world = World()
    world.entities = build_entities(rng, n_entities)

    counters = dict.fromkeys(SOURCES, 0)

    def emit(ent: Entity, source: str, *, name_override: str | None = None,
             ensure_tax: bool = False) -> None:
        counters[source] += 1
        conv_id = f"conv-{source}-{counters[source]:06d}"
        rows = _conversation(rng, conv_id, source, ent, counters[source],
                             ensure_tax=ensure_tax)
        if name_override is not None:
            # within-source dup / confusion record: swap the opener's name
            rows[0]["text"] = rng.choice(
                [
                    f"Hi, I'm calling about {name_override}.",
                    f"Hello, this is a representative of {name_override}.",
                    f"Account inquiry for {name_override}.",
                ]
            )
        world.turns.extend(rows)
        world.truth.append(
            {
                "conv_id": conv_id,
                "entity_id": ent.entity_id,
                "family_id": ent.family_id,
                "source_tag": source,
            }
        )

    for ent in world.entities:
        for source in SOURCES:
            if rng.random() < SOURCE_PROBS[source]:
                emit(ent, source)
                if source == "crm" and rng.random() < within_source_dup_p:
                    emit(ent, source, name_override=_name_variant(rng, ent.name, "claims"))

    # Orphans: records with no possible match (single-source singletons).
    n_orphans = rng.randint(*orphan_range)
    for i in range(n_orphans):
        eid = len(world.entities) + i + 1
        orphan = Entity(
            entity_id=eid,
            family_id=f"orphan-{i:03d}",
            name=f"{rng.choice(_ORG_ADJ)}{rng.choice(['field', 'brook', 'gate', 'port'])} "
                 f"Orphan Plan {i}",
            tax_id=_mk_tax(rng),
            state=rng.choice(_STATES),
            city=_mk_city(rng),
            address=_mk_address(rng),
            zip=_mk_zip(rng),
            phone=_mk_phone(rng),
            website=None,
            entity_type="commercial",
            lob="PPO",
            is_parent=False,
            parent_name=None,
            is_active=True,
            effective_date="2022-01-01",
            dba=None,
            cms_plan_id=None,
            npi=None,
        )
        world.entities.append(orphan)
        emit(orphan, "crm")

    # Parent/child confusion: child emitted under the parent's name in claims.
    confused = 0
    for ent in world.entities:
        if ent.parent_name and rng.random() < 0.25 and confused < confusion_cap:
            # Labeled with the *child's* entity_id: a deliberately hard case.
            emit(ent, "claims", name_override=_name_variant(rng, ent.parent_name, "claims"),
                 ensure_tax=True)
            confused += 1

    return world


# ---------------------------------------------------------------------------
# Arrow/parquet materialization (no Spark dependency; usable from pytest,
# bench, and the driver entry alike)
# ---------------------------------------------------------------------------

def world_to_tables(world: World):
    """Return (turns_table, truth_table) as pyarrow Tables."""
    import pyarrow as pa

    turns_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    cols = {k: [r[k] for r in world.turns] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    turns = pa.Table.from_pydict(cols, schema=turns_schema)
    truth_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("entity_id", pa.int64()),
            pa.field("family_id", pa.string()),
            pa.field("source_tag", pa.string()),
        ]
    )
    tcols = {k: [r[k] for r in world.truth] for k in ("conv_id", "entity_id", "family_id", "source_tag")}
    truth = pa.Table.from_pydict(tcols, schema=truth_schema)
    return turns, truth


# ---------------------------------------------------------------------------
# Sharded generation (distributed worlds — VERDICT r03 item 3)
#
# The sequential generate_world threads ONE rng through the whole world, so
# it cannot parallelize and caps F1/bench evidence near 100k entities. The
# sharded scheme below re-keys randomness per (seed, shard): each shard owns
# a contiguous range of FAMILY indices (curated families are global indices
# 0..7, synthetic families use the same _synthetic_base grid), entity ids
# come from a fixed per-family stride, and conv ids embed the entity id —
# so any shard can be generated independently, executor-side, with no
# cross-shard state. The driver-side twin (sharded_world_tables) is the
# same per-shard calls concatenated, which makes distributed == driver
# bit-equal BY CONSTRUCTION and testable. generate_world stays untouched:
# golden fixtures pin its exact stream.
# ---------------------------------------------------------------------------

FAMILY_ID_STRIDE = 8  # entity-id slots per family (max parent + 4 children)

TURNS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
TRUTH_DDL = "conv_id string, entity_id long, family_id string, source_tag string"


def generate_world_shard(
    seed: int,
    shard_id: int,
    families_per_shard: int,
    n_families: int,
    within_source_dup_p: float = 0.05,
    orphan_range: tuple[int, int] = (5, 8),
    confusion_per_shard: int = 2,
) -> World:
    """Generate ONE shard (family range) of a sharded world.

    Randomness is keyed on (seed, shard_id) only; entity ids are
    ``family_index * FAMILY_ID_STRIDE + slot + 1`` and conv ids embed the
    entity id, so shards compose without collisions. Orphans and
    parent/child-confusion records are emitted per shard (density scales
    with world size, unlike the fixed-count sequential path)."""
    rng = random.Random(f"shard:{seed}:{shard_id}")
    world = World()
    f_lo = shard_id * families_per_shard
    f_hi = min(f_lo + families_per_shard, n_families)
    if f_lo >= f_hi:
        return world

    def add(fi: int, slot: int, name: str, family_id: str, *,
            parent_name: str | None, is_parent: bool, tax: str | None,
            state: str | None = None, cms: str | None = None,
            dba: str | None = None) -> Entity:
        st = state or rng.choice(_STATES)
        ent = Entity(
            entity_id=fi * FAMILY_ID_STRIDE + slot + 1,
            family_id=family_id,
            name=name,
            tax_id=tax,
            state=st,
            city=_mk_city(rng) if rng.random() < 0.7 else rng.choice(_CITY_WORDS),
            address=_mk_address(rng),
            zip=_mk_zip(rng),
            phone=_mk_phone(rng),
            website=(
                "https://www."
                + name.lower().replace(" ", "").replace(",", "").replace("/", "")[:20]
                + ".com"
            ),
            entity_type=rng.choice(["commercial", "medicare", "medicaid", "exchange"]),
            lob=rng.choice(["PPO", "HMO", "EPO", "POS"]),
            is_parent=is_parent,
            parent_name=parent_name,
            is_active=rng.random() > 0.08,
            effective_date=f"{2000 + rng.randint(0, 20)}-{rng.randint(1, 12):02d}-01",
            dba=dba,
            cms_plan_id=cms,
            npi=f"1{rng.randint(100000000, 999999999)}" if rng.random() < 0.25 else None,
        )
        world.entities.append(ent)
        return ent

    for fi in range(f_lo, f_hi):
        if fi < len(_CURATED_FAMILIES):
            fam = _CURATED_FAMILIES[fi]
            fam_id = f"fam-{fi:03d}"
            fam_tax = _mk_tax(rng)
            slot = 0
            parent = fam.get("parent")
            if parent:
                add(fi, slot, parent, fam_id, parent_name=None,
                    is_parent=True, tax=fam_tax)
                slot += 1
            if fam.get("bcbs"):
                children = [
                    f"{fam['children_base']} of {_CODE_TO_NAME[s]}"
                    for s in fam["states"]
                ]
            else:
                children = fam.get("children", [])
            for ch in children:
                cms = (
                    f"H{rng.randint(1000, 9999)}-{rng.randint(1, 99):03d}"
                    if rng.random() < 0.5 else None
                )
                dba = (
                    ch.split(" of ")[0]
                    if (" of " in ch and rng.random() < 0.3) else None
                )
                add(fi, slot, ch, fam_id, parent_name=parent, is_parent=False,
                    tax=_mk_tax(rng), cms=cms, dba=dba)
                slot += 1
        else:
            si = fi - len(_CURATED_FAMILIES)
            fam_id = f"syn-{si:07d}"
            base = _synthetic_base(si)
            fam_tax = _mk_tax(rng)
            n_children = rng.randint(1, 3)
            parent_name = base if n_children > 1 and rng.random() < 0.4 else None
            slot = 0
            used_states: set[str] = set()
            if parent_name:
                p = add(fi, slot, parent_name, fam_id, parent_name=None,
                        is_parent=True, tax=fam_tax)
                slot += 1
                used_states.add(p.state)
            for _ in range(n_children):
                st = rng.choice([s for s in _STATES if s not in used_states])
                used_states.add(st)
                child = (
                    f"{base} of {_CODE_TO_NAME[st]}"
                    if (parent_name or n_children > 1) else base
                )
                cms = (
                    f"H{rng.randint(1000, 9999)}-{rng.randint(1, 99):03d}"
                    if rng.random() < 0.4 else None
                )
                add(fi, slot, child, fam_id, parent_name=parent_name,
                    is_parent=False, tax=_mk_tax(rng), state=st, cms=cms)
                slot += 1

    def emit(ent: Entity, source: str, seq: int, *,
             name_override: str | None = None, ensure_tax: bool = False) -> None:
        conv_id = f"conv-{source}-e{ent.entity_id:010d}-{seq}"
        rows = _conversation(rng, conv_id, source, ent,
                             conv_seq=ent.entity_id * 4 + seq,
                             ensure_tax=ensure_tax)
        if name_override is not None:
            rows[0]["text"] = rng.choice(
                [
                    f"Hi, I'm calling about {name_override}.",
                    f"Hello, this is a representative of {name_override}.",
                    f"Account inquiry for {name_override}.",
                ]
            )
        world.turns.extend(rows)
        world.truth.append(
            {
                "conv_id": conv_id,
                "entity_id": ent.entity_id,
                "family_id": ent.family_id,
                "source_tag": source,
            }
        )

    shard_entities = list(world.entities)
    for ent in shard_entities:
        for source in SOURCES:
            if rng.random() < SOURCE_PROBS[source]:
                emit(ent, source, 0)
                if source == "crm" and rng.random() < within_source_dup_p:
                    emit(ent, source, 1,
                         name_override=_name_variant(rng, ent.name, "claims"))

    # orphans: per-shard so density scales with world size; ids live in the
    # family-index space beyond n_families (bounded by FAMILY_ID_STRIDE)
    n_orphans = rng.randint(*orphan_range)
    for i in range(min(n_orphans, FAMILY_ID_STRIDE)):
        orphan = Entity(
            entity_id=(n_families + shard_id) * FAMILY_ID_STRIDE + i + 1,
            family_id=f"orphan-{shard_id:05d}-{i:02d}",
            name=f"{rng.choice(_ORG_ADJ)}{rng.choice(['field', 'brook', 'gate', 'port'])} "
                 f"Orphan Plan {shard_id * FAMILY_ID_STRIDE + i}",
            tax_id=_mk_tax(rng),
            state=rng.choice(_STATES),
            city=_mk_city(rng),
            address=_mk_address(rng),
            zip=_mk_zip(rng),
            phone=_mk_phone(rng),
            website=None,
            entity_type="commercial",
            lob="PPO",
            is_parent=False,
            parent_name=None,
            is_active=True,
            effective_date="2022-01-01",
            dba=None,
            cms_plan_id=None,
            npi=None,
        )
        world.entities.append(orphan)
        emit(orphan, "crm", 0)

    confused = 0
    for ent in shard_entities:
        if ent.parent_name and rng.random() < 0.25 and confused < confusion_per_shard:
            emit(ent, "claims", 2,
                 name_override=_name_variant(rng, ent.parent_name, "claims"),
                 ensure_tax=True)
            confused += 1

    return world


def sharded_world_tables(
    seed: int, n_families: int, families_per_shard: int = 256, **kw
) -> World:
    """Driver-side twin of the distributed path: every shard generated
    locally and concatenated. Used by the bit-equality test and for small
    sharded worlds without a SparkSession."""
    import math

    out = World()
    for s in range(math.ceil(n_families / families_per_shard)):
        w = generate_world_shard(seed, s, families_per_shard, n_families, **kw)
        out.turns.extend(w.turns)
        out.truth.extend(w.truth)
        out.entities.extend(w.entities)
    return out


def distributed_world(
    spark, seed: int, n_families: int, families_per_shard: int = 256, **kw
):
    """(turns_df, truth_df) generated EXECUTOR-side via mapInPandas over
    shard ids — one task per shard, no driver materialization, unlocking
    n >= 1M-entity worlds (VERDICT r03 item 3). Bit-equal to
    ``sharded_world_tables`` by construction (pinned in
    tests/test_datagen_sharded.py). Truth regenerates its shards in a
    second pass — generation is cheap relative to the pipeline, and the
    two frames are usually both written once to parquet anyway."""
    import math

    n_shards = math.ceil(n_families / families_per_shard)
    shards = spark.range(0, n_shards, numPartitions=n_shards)

    def gen(which: int):
        def fn(batches):
            for pdf in batches:
                for sid in pdf["id"].tolist():
                    w = generate_world_shard(
                        seed, int(sid), families_per_shard, n_families, **kw
                    )
                    yield world_to_tables(w)[which].to_pandas()
        return fn

    return (
        shards.mapInPandas(gen(0), TURNS_DDL),
        shards.mapInPandas(gen(1), TRUTH_DDL),
    )


def write_world(world: World, out_dir: str) -> tuple[str, str]:
    """Write turns + truth parquet under out_dir; returns the two paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    turns, truth = world_to_tables(world)
    turns_path = os.path.join(out_dir, "transcript_turns.parquet")
    truth_path = os.path.join(out_dir, "ground_truth.parquet")
    pq.write_table(turns, turns_path)
    pq.write_table(truth, truth_path)
    return turns_path, truth_path
