"""Sources: the Common-Crawl-style pages table and scan/sink helpers.

Input contract (BASELINE.json → input_hint): an Iceberg table of web
pages with columns ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``. In this sandbox there is no Iceberg
catalog, so :func:`read_pages` reads the same schema from parquet/JSON;
the production entry point is a one-line swap to
``spark.read.format("iceberg").load(table)``.

:func:`synth_pages` generates a deterministic synthetic corpus of that
exact shape **entirely with Catalyst expressions over
``spark.range``** — no driver-side loops, no RNG, so the same call
scales from 1e3 rows (tests) to 1e9 rows (cluster soak) by changing one
integer, and every run/partitioning yields byte-identical rows.

Ground truth: page ``p`` mentions entity ``p % n_entities``; pages of
the same entity render the address in different surface forms (format,
spelling variants, Bangla script/numerals) the way duplicate mentions
differ across the web. ``truth_entity_id`` rides along in a sidecar
DataFrame (never in the pages table itself) for F1 evaluation against
the linkage output — modeled on the reference's labeled corpus
(``data/raw/merged_addresses.json``, 1,363 records; SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import gazetteer as gz

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# Bangla numerals for the Bangla-script surface form (reference
# normalizer tables, src/core/stages/normalizer.py:13-16).
_BN_DIGITS = "০১২৩৪৫৬৭৮৯"

# area → one known misspelling (reference variant vocabulary,
# district_processor.py:292-407 / area variants). Only variants the
# extraction vocabulary actually resolves are used — an unresolvable
# misspelling would silently drop the area + predicted postal and make
# the page unlinkable (not the scenario the corpus models). Areas
# without a listed variant keep the canonical spelling.
_MISSPELL = {
    "Bashundhara R/A": "Bashundhara",
}

# Synthesis areas: the gazetteer areas filtered to one area per postal
# code (first listed wins). Two areas sharing a postal code are not
# separable by the reference's pairwise weights when house/road slots
# collide (postal+district+division alone carry 0.60 of the weight), so
# the labeled corpus is built over postal-unique areas; the full AREAS
# list still backs the extraction gazetteer. The separability margin
# (max cross-entity score ≤ 0.80 < 0.85 threshold) is asserted
# exhaustively in tests with the pure-Python oracle.
# Pinned to the CURATED rows: the fact-side corpus must stay separable
# and round-comparable while the dimension tables scale to reference
# density (dims.AREAS adds near-identical synthetic names by design —
# they are dim-side collision fodder, not labeled entities).
_seen: set[str] = set()
SYNTH_AREAS: list[tuple[str, str, str]] = [
    t for t in gz.CURATED_AREAS if not (t[2] in _seen or _seen.add(t[2]))
]


def _bn_num(col):
    """ASCII digits → Bangla numerals (inverse of normalize stage)."""
    return F.translate(col.cast("string"), "0123456789", _BN_DIGITS)


def synth_pages(
    spark: SparkSession,
    n_pages: int = 4_000,
    n_entities: int = 1_000,
    n_partitions: int | None = None,
    hot_postal_frac: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """→ (pages, truth) where pages matches ``PAGES_SCHEMA`` and truth is
    ``(url, truth_entity_id)``.

    Entity e's canonical address: area = AREAS[e % |AREAS|] (which pins
    district/division/postal); with s = e // |AREAS| and q = ai // 9,
    house = 11·(1 + (s+ai) % 9) and road = 1 + (s+q) % 9. The digit
    sets of distinct house slots (11..99) and road slots (1..9) are
    pairwise disjoint, and the ai/q offsets decorrelate slots across
    areas, so any two distinct entity classes disagree on house and/or
    road with similarity 0 and score strictly below the 0.85 reference
    match threshold — i.e. the generator's entity ids coincide with the
    clusters the reference's own ``compare`` semantics induce
    (property-checked exhaustively in tests via the pure-Python
    oracle). That holds for up to 9·|AREAS| separable entity classes;
    beyond that, entities repeat addresses and ``truth_entity_id``
    collapses accordingly (fine for throughput benches, which only
    need volume). Page p of entity e renders variant
    v = p // n_entities (mod 4):

      v0  "House 12, Road 5, Gulshan, Dhaka-1212"          (en, canonical)
      v1  "H-12, R-5, Gulshan, Dhaka 1212"                  (en, compact)
      v2  "বাড়ি ১২, রোড ৫, Gulshan, ঢাকা-১২১২"             (bn, Bangla form)
      v3  "House No 12, Road No 5, <misspelled area>, Dhaka" (en, no postal)

    Surrounding boilerplate differs per page so exact-dup logic never
    collapses distinct pages.
    """
    areas = SYNTH_AREAS
    n_areas = len(areas)
    area_arr = F.array(*[F.lit(a) for a, _, _ in areas])
    area_var_arr = F.array(*[F.lit(_MISSPELL.get(a, a)) for a, _, _ in areas])
    district_arr = F.array(*[F.lit(d) for _, d, _ in areas])
    postal_arr = F.array(*[F.lit(p) for _, _, p in areas])

    df = spark.range(0, n_pages, 1, n_partitions or spark.sparkContext.defaultParallelism)
    e = (F.col("id") % n_entities).alias("e")
    v = F.pmod(F.floor(F.col("id") / n_entities), F.lit(4))
    df = df.select(
        "id",
        e,
        v.alias("v"),
        (F.col("id") % n_entities % n_areas).cast("int").alias("ai"),
    )
    s = F.floor(F.col("e") / n_areas)
    house = (((s + F.col("ai")) % 9 + 1) * 11).cast("string")
    road = ((s + F.floor(F.col("ai") / 9)) % 9 + 1).cast("string")
    area = F.element_at(area_arr, F.col("ai") + 1)
    area_mis = F.element_at(area_var_arr, F.col("ai") + 1)
    district = F.element_at(district_arr, F.col("ai") + 1)
    postal = F.element_at(postal_arr, F.col("ai") + 1)
    if hot_postal_frac:
        # skew knob (bench-only, default off): the chosen fraction of
        # entities shares ONE postal code, concentrating that share of
        # postal-bearing mentions into a single p:<postal> block. The
        # (house, road) digit separability is untouched, so truth ids
        # and the ≤0.80 cross-entity score margin still hold (postal+
        # area+district+division weights sum to 0.80 < 0.85 threshold).
        # Permille resolution over a hashed entity id: the previous
        # tenths quantization (e % 10 < round(frac*10)) silently zeroed
        # any fraction < 0.05 (banker's rounding) and bent 0.15 to 0.2;
        # hashing keeps the fraction exact even when n_entities < 1000.
        # round, don't truncate: 0.29*1000 is 289.999… in binary float
        hot = F.pmod(F.xxhash64(F.col("e")), F.lit(1000)) < int(round(hot_postal_frac * 1000))
        postal = F.when(hot, F.lit("1212")).otherwise(postal)

    addr = (
        F.when(F.col("v") == 0, F.concat(
            F.lit("House "), house, F.lit(", Road "), road, F.lit(", "),
            area, F.lit(", "), district, F.lit("-"), postal))
        .when(F.col("v") == 1, F.concat(
            F.lit("H-"), house, F.lit(", R-"), road, F.lit(", "),
            area, F.lit(", "), district, F.lit(" "), postal))
        .when(F.col("v") == 2, F.concat(
            F.lit("বাড়ি "), _bn_num(house), F.lit(", রোড "), _bn_num(road),
            F.lit(", "), area, F.lit(", "),
            F.when(district == "Dhaka", F.lit("ঢাকা")).otherwise(district),
            F.lit("-"), _bn_num(postal)))
        .otherwise(F.concat(
            F.lit("House No "), house, F.lit(", Road No "), road,
            F.lit(", "), area_mis, F.lit(", "), district))
    )
    text = F.concat(
        F.lit("Contact page "), F.col("id").cast("string"),
        F.lit(". Office address: "), addr,
        F.lit(". Phone 01"), F.lpad((F.col("id") % 100000000).cast("string"), 9, "0"),
        F.lit("."),
    )
    pages = df.select(
        F.concat(F.lit("https://site"), (F.col("id") % 997).cast("string"),
                 F.lit(".example.com/page/"), F.col("id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00")) +
         F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8").alias("html"),
        text.alias("text"),
        F.when(F.col("v") == 2, F.lit("bn")).otherwise(F.lit("en")).alias("lang"),
        # collapse to the address-equivalence class (see docstring)
        (F.col("ai") + n_areas * (F.floor(F.col("e") / n_areas) % 9)).alias("truth_entity_id"),
    )
    truth = pages.select("url", "truth_entity_id")
    return pages.drop("truth_entity_id"), truth


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Scan the pages table (S1). With an Iceberg catalog this becomes
    ``spark.read.format('iceberg').load(path)`` — same downstream plan;
    partition pruning and column pruning flow through either way."""
    reader = spark.read.format(fmt)
    if fmt == "json":
        reader = reader.schema(PAGES_SCHEMA)
    return reader.load(path)


def write_banded(
    df: DataFrame,
    path: str,
    confidence_col: str = "overall_confidence",
    fmt: str = "parquet",
) -> None:
    """S6/D2: partitioned-by-confidence-band sink.

    Reference: ``split`` routes records into 8 confidence-band
    directories plus a not-found band
    (src/regex/house_number_processor.py:1248-1319). Spark-native form:
    a band column + ``partitionBy`` — one pass, no driver routing, and
    downstream ``reprocess <band>`` jobs get partition pruning for free.
    """
    from ..functions.format import confidence_band_expr

    # ONE band rule (functions.format.CONFIDENCE_BANDS) shared with the
    # A4 histogram — the sink and the report can't silently diverge
    band = confidence_band_expr(confidence_col)
    df.withColumn("band", band).write.mode("overwrite").partitionBy("band").format(fmt).save(path)


def read_band(spark: SparkSession, path: str, band: str) -> DataFrame:
    """D3 ``reprocess <band>``: read one confidence band back. The
    band filter prunes to that partition directory (partition pruning —
    no full scan), which is the point of the banded layout."""
    return spark.read.parquet(path).filter(F.col("band") == band)


def merge_by_id(master: DataFrame, updates: DataFrame, id_col: str) -> DataFrame:
    """D3 ``sync <band>``: upsert edited rows into the master table by
    id — the engine-agnostic form of Iceberg ``MERGE INTO`` (anti-join
    keeps untouched rows, union adds the new versions). With an Iceberg
    catalog this one-liner becomes
    ``spark.sql("MERGE INTO master USING updates ON ... WHEN MATCHED
    UPDATE ... WHEN NOT MATCHED INSERT *")`` with snapshot isolation."""
    keep = master.join(updates.select(id_col), id_col, "left_anti")
    return keep.unionByName(updates.select(*master.columns))
