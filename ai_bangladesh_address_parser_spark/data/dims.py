"""Reference-density synthetic dimension build.

The reference's offline geo state is 598 upazilas / 3,215 unions /
2,974 villages / 1,226 postal-code rows / ~400 common areas
(``src/geo/bangladesh_geo_offline.py:58-200``; area vocabulary
``src/regex/district_processor.py:410-514``). Rounds 1-2 ran a toy
subset (54/150/100/30/38); this module expands every dimension to the
reference's densities **deterministically** (no RNG, no external data):

  * the toy rows are preserved verbatim as a prefix — every name, code
    and per-upazila union/village count the tests and golden fixtures
    pin is unchanged;
  * every one of the 64 districts gains a real "<district> Sadar"
    upazila (the reference's full set has one per non-metro district)
    plus synthetic "<district>pur<i>" fillers, Dhaka kept hot (3x
    weight) so skew handling stays exercised;
  * postal codes are unique 4-digit strings drawn from per-district
    cursors inside division ranges, skipping every curated/legacy code
    (codes stay a functional code→district map — j3 consistency and j1
    enrichment joins never fan out);
  * the postal DB gains a "<upazila> TSO" office per upazila and
    "<upazila> Bazar SO" extras to exactly 1,226 rows, so J4's
    priority-4/5 office index runs at reference density;
  * ~400 areas include "<upazila> Bazar" / "New <upazila>" pairs that
    SHARE the upazila's postal code and CONTAIN its name — the
    shared-postal dominance and prefix/containment collisions the toy
    dims could not expose (J4 priority-5, J5 token hits, A5 dominance).

All real names are public administrative geography; synthetic tokens
("...pur12", "...hat3", "...gram1") are chosen so they can never match
real corpus text, keeping golden-corpus accuracy independent of dim
density.
"""

from __future__ import annotations

from .gazetteer import (
    CURATED_AREAS,
    CURATED_POSTAL_CODES,
    DISTRICT_DIVISION,
    DISTRICT_TO_DIVISION,
    _AREA_VARIANT_SEEDS,
)

N_UPAZILAS, N_UNIONS, N_VILLAGES = 598, 3215, 2974
N_POSTAL, N_AREAS = 1226, 400

# ---------------------------------------------------------------------------
# Toy prefix — byte-identical to the rounds-1/2 dims (tests pin these).

_DISTRICT_PLAN: list[tuple[str, int, int]] = [
    ("Dhaka", 20, 1340),
    ("Chattogram", 6, 4330),
    ("Sylhet", 4, 3170),
    ("Rajshahi", 4, 6210),
    ("Khulna", 4, 9240),
    ("Barisal", 4, 8250),
    ("Rangpur", 4, 5440),
    ("Mymensingh", 4, 2280),
]

_REAL_UPAZILAS: dict[str, list[str]] = {
    "Dhaka": ["Savar", "Dhamrai", "Keraniganj", "Nawabganj", "Dohar"],
    "Chattogram": ["Patiya", "Sitakunda", "Hathazari", "Raozan"],
    "Sylhet": ["Beanibazar", "Golapganj"],
    "Rajshahi": ["Paba", "Charghat"],
    "Khulna": ["Dumuria", "Rupsa"],
    "Barisal": ["Bakerganj", "Muladi"],
    "Rangpur": ["Badarganj", "Kaunia"],
    "Mymensingh": ["Trishal", "Bhaluka"],
}

_SATELLITE_UPAZILAS: list[tuple[str, str, str]] = [
    ("Gazipur Sadar", "Gazipur", "1700"),
    ("Narayanganj Sadar", "Narayanganj", "1400"),
    ("Naogaon Sadar", "Naogaon", "6500"),
    ("Bogura Sadar", "Bogura", "5800"),
]


def _build_toy() -> tuple[list[tuple], list[tuple], list[tuple]]:
    upazilas, unions, villages = [], [], []
    for district, n_up, base in _DISTRICT_PLAN:
        division = DISTRICT_TO_DIVISION[district]
        seeds = _REAL_UPAZILAS[district]
        for i in range(n_up):
            name = seeds[i] if i < len(seeds) else f"{district}pur{i}"
            code = str(base + 2 * i)
            upazilas.append((name, district, division, code))
            for j in range(1, 4):
                unions.append((f"{name}hat{j}", name, district, division, code))
            for j in range(1, 3):
                villages.append(
                    (f"{name}gram{j}", f"{name}hat1", name, district, division, code)
                )
    for name, district, code in _SATELLITE_UPAZILAS:
        upazilas.append((name, district, DISTRICT_TO_DIVISION[district], code))
    return upazilas, unions, villages


# ---------------------------------------------------------------------------
# Expansion to reference density.

# Division code bases chosen inside real first-digit ranges but clear of
# every curated metro code (1000-1230, 2000/2200, 3100, 4000-4225,
# 5400, 6000/6100, 8200, 9100/9202) and legacy upazila bases.
_DIVISION_BASE = {
    "Dhaka": 1300, "Mymensingh": 2300, "Sylhet": 3300, "Chattogram": 4300,
    "Rangpur": 5500, "Rajshahi": 6300, "Barisal": 8300, "Khulna": 9300,
}
_BLOCK_WIDTH = 55  # per-district slice inside the division range


def _build_full():
    toy_up, toy_un, toy_vg = _build_toy()

    taken = {c for *_, c in toy_up}
    taken |= {c for c, _, _ in CURATED_POSTAL_CODES}
    taken |= {c for _, _, c in CURATED_AREAS}

    districts = [d for d, _ in DISTRICT_DIVISION]
    rank_in_div: dict[str, int] = {}
    seen_per_div: dict[str, int] = {}
    for d, dv in DISTRICT_DIVISION:
        rank_in_div[d] = seen_per_div.get(dv, 0)
        seen_per_div[dv] = rank_in_div[d] + 1

    cursor = {
        d: _DIVISION_BASE[DISTRICT_TO_DIVISION[d]] + rank_in_div[d] * _BLOCK_WIDTH
        for d in districts
    }

    def next_code(district: str) -> str:
        c = cursor[district]
        while str(c) in taken:
            c += 1
        cursor[district] = c + 1
        taken.add(str(c))
        return str(c)

    upazilas = list(toy_up)
    have_sadar = {n for n, *_ in upazilas if n.endswith(" Sadar")}

    # 1) one "<district> Sadar" per district still missing one (60 rows)
    for d in districts:
        name = f"{d} Sadar"
        if name in have_sadar:
            continue
        upazilas.append((name, d, DISTRICT_TO_DIVISION[d], next_code(d)))

    # 2) synthetic fillers, Dhaka 3x weight, up to N_UPAZILAS
    weighted = ["Dhaka", "Dhaka"] + districts
    counters = {d: 100 for d in districts}  # start at 100: toy used <20
    i = 0
    while len(upazilas) < N_UPAZILAS:
        d = weighted[i % len(weighted)]
        i += 1
        name = f"{d}pur{counters[d]}"
        counters[d] += 1
        upazilas.append((name, d, DISTRICT_TO_DIVISION[d], next_code(d)))

    generated = upazilas[len(toy_up):]

    # unions: toy upazilas keep exactly 3 each; generated get 6 then 5
    # so the total lands on N_UNIONS. Same scheme for villages (6/5),
    # attached to "<name>hat1" like the toy rows.
    unions = list(toy_un)
    villages = list(toy_vg)
    need_un = N_UNIONS - len(toy_un)
    need_vg = N_VILLAGES - len(toy_vg)
    n_six_un = need_un - 5 * len(generated)       # upazilas with 6 unions
    n_six_vg = need_vg - 5 * len(generated)       # upazilas with 6 villages
    assert 0 <= n_six_un <= len(generated) and 0 <= n_six_vg <= len(generated)
    for gi, (name, d, dv, code) in enumerate(generated):
        for j in range(1, (7 if gi < n_six_un else 6)):
            unions.append((f"{name}hat{j}", name, d, dv, code))
        for j in range(1, (7 if gi < n_six_vg else 6)):
            villages.append((f"{name}gram{j}", f"{name}hat1", name, d, dv, code))

    # postal DB: curated + "<upazila> TSO" per upazila (skipping the two
    # whose code the curated rows already carry) + "<upazila> Bazar SO"
    # extras with fresh codes, to exactly N_POSTAL unique-code rows.
    curated_codes = {c for c, _, _ in CURATED_POSTAL_CODES}
    postal = list(CURATED_POSTAL_CODES)
    for name, d, _dv, code in upazilas:
        if code in curated_codes:
            continue
        postal.append((code, d, f"{name} TSO"))
    k = 0
    while len(postal) < N_POSTAL:
        name, d, _dv, _code = upazilas[k % len(upazilas)]
        postal.append((next_code(d), d, f"{name} Bazar SO"))
        k += 1

    # areas: curated + ("<upazila> Bazar", "New <upazila>") pairs over
    # the first generated upazilas — each pair SHARES the upazila's
    # postal code (A5/J1 dominance) and contains its name (J4 p5 / J5
    # prefix collisions) — to exactly N_AREAS rows.
    areas = list(CURATED_AREAS)
    gi = 0
    while len(areas) < N_AREAS:
        name, d, _dv, code = generated[gi]
        areas.append((f"{name} Bazar", d, code))
        if len(areas) < N_AREAS:
            areas.append((f"New {name}", d, code))
        gi += 1

    return upazilas, unions, villages, postal, areas


UPAZILAS, UNIONS, VILLAGES, POSTAL_CODES, AREAS = _build_full()

assert len(UPAZILAS) == N_UPAZILAS and len(UNIONS) == N_UNIONS
assert len(VILLAGES) == N_VILLAGES and len(POSTAL_CODES) == N_POSTAL
assert len(AREAS) == N_AREAS
assert len({c for c, _, _ in POSTAL_CODES}) == N_POSTAL, "postal codes must be unique"

AREA_VARIANTS: list[tuple[str, str]] = _AREA_VARIANT_SEEDS + [
    (a.lower(), a) for a, _, _ in AREAS
]

VALID_POSTAL_CODES = frozenset(code for code, _, _ in POSTAL_CODES)
