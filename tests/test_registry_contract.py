"""The driver's correctness gate covers only the FIRST 50 entries of
``__spark_entry__.queries()`` (observed r04: CORRECTNESS_r04.json had
exactly the first 50 registry entries, silently dropping 17 later
queries). Registry ORDER is therefore part of the driver contract —
these tests pin it so a future insertion cannot silently push an
oracled query out of the verified window again.

Pure-Python (no SparkSession): imports the registry dicts only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

DRIVER_WINDOW = 50

# tail oracled queries: each was driver-green in CORRECTNESS_r04.json
# and is covered by pytest + in-window siblings (BENCH.md round-5 §1)
EXPECTED_ORACLED_TAIL = {
    "t11_format", "t12_country", "j7_suggest", "j8_enrich",
    "a3_batch_stats", "a4_confidence_histogram", "a6_area_vocab",
    "p3_validate", "p5_jaro_winkler", "p9_pr_curve", "p10_compare_detail",
}

# rows-only queries: no SQL oracle exists (streaming / stateful /
# incremental / learned-NER) — pytest equivalence covers them instead
EXPECTED_ROWS_ONLY = {
    "t13_ner_learned", "s9_stream_extract", "s10_stateful_dedup",
    "s11_incremental_link", "s12_stream_link", "s13_stream_events",
}


def test_first_fifty_registry_entries_are_all_oracled():
    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    window = names[:DRIVER_WINDOW]
    missing = [n for n in window if n not in oracles]
    assert not missing, (
        f"queries inside the driver's {DRIVER_WINDOW}-entry correctness "
        f"window without an oracle_sql() entry: {missing}"
    )


def test_registry_tail_is_exactly_the_documented_set():
    names = list(entry_mod.queries())
    tail = set(names[DRIVER_WINDOW:])
    assert tail == EXPECTED_ORACLED_TAIL | EXPECTED_ROWS_ONLY, (
        "registry tail changed — if a NEW query was added, it must go in "
        "the tail only if rows-only or already driver-verified; update "
        "BENCH.md round-5 §1 and this test together"
    )


def test_every_query_has_oracle_or_is_documented_rows_only():
    names = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= names, f"orphan oracles: {sorted(oracles - names)}"
    rows_only = names - oracles
    assert rows_only == EXPECTED_ROWS_ONLY, (
        f"undocumented rows-only queries: {sorted(rows_only - EXPECTED_ROWS_ONLY)}"
    )
