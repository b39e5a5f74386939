"""Address-likelihood gate — the cheap pre-filter in front of the deep
extraction battery.

At Common-Crawl composition ~99% of pages carry no address at all, yet
the S1 fallback (`plans.pipeline.harvest_mentions_expr`) deliberately
keeps every page so nothing is dropped silently. Without a gate those
pure-prose pages flow through the T4/T5/T6 pandas-UDF battery and the
minhash banding — real Python and shuffle cost for rows that can only
produce empty components.

The gate is ONE whole-stage-codegen `rlike` over the lowercased text.
A mention passes if it shows ANY cheap evidence an extractor could act
on:

  * a digit (ASCII or Bangla) — every house/postal/flat/floor tier and
    the FSM parse anchor on digits;
  * an address keyword (house/road/flat/thana/… incl. Bangla forms) —
    the anchor set of the keyword tiers;
  * a gazetteer vocabulary hit — any district spelling variant (English
    or Bangla, `data.gazetteer.DISTRICT_VARIANTS`) or curated area name
    / spelling variant: the anchor set of the vocab-join and fuzzy-area
    stages.

Soundness: a text with NO digit, NO keyword and NO vocab token can
produce no regex/vocab/deep evidence (every evidence family anchors on
one of those), and the second-pass stages (fuzzy/position/gazetteer/
geo) only refine first-pass evidence — so skipping such a text yields
byte-identical pipeline output, just without the work. Verified by the
gate-equivalence pytest.

The reference has no analogue (it is handed addresses, not web pages);
the gate exists for the north rule's 10^12-page corpus, where it makes
S1+S2 cost scale with the number of address-bearing pages rather than
the page count. Skipped-row counts ride the pipeline's metrics
(`LinkagePlan.metrics()["s1_gate"]`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..data import gazetteer as gz

# Keyword anchors of the extraction tiers (operators/extract.py regex
# battery + operators/house_road.py): any of these present means a
# keyword-anchored extractor could fire.
_KEYWORDS = [
    "house", "holding", "building", "bldg", "plot", "flat", "apartment",
    "apt", "road", "rd.", "street", "lane", "avenue", "block", "sector",
    "floor", "lift", "level", "thana", "post office", "p.o", "ward",
    "bazar", "bazaar", "market", "city", "town",
    # Bangla forms (the battery's Bangla tiers)
    "বাড়ি", "বাসা", "হোল্ডিং", "প্লট", "ফ্ল্যাট", "রোড", "সড়ক", "রাস্তা",
    "গলি", "ব্লক", "সেক্টর", "তলা", "লিফট", "থানা", "ডাকঘর", "এলাকা",
]


def _vocab_terms() -> list[str]:
    """Lowercased gazetteer surface the vocab/fuzzy stages anchor on.

    District variants already include all 64 English names, the Bangla
    spellings and the common misspellings; curated areas + seed
    variants cover the labeled area vocabulary. The generated dim rows
    (dims.AREAS density filler) are district-name-prefixed by
    construction, so the district alternatives subsume them.
    """
    vocab = {v for v, _ in gz.DISTRICT_VARIANTS}
    vocab |= {a.lower() for a, _, _ in gz.CURATED_AREAS}
    vocab |= {v for v, _ in gz._AREA_VARIANT_SEEDS}
    return sorted(vocab, key=len, reverse=True)


def _build_pattern() -> str:
    alts = [re.escape(w) for w in _KEYWORDS + _vocab_terms()]
    # digit class first: most address-bearing text exits on it at the
    # first digit position, long before the alternation is tried
    return "[0-9০-৯]|" + "|".join(alts)


SIGNAL_PATTERN = _build_pattern()


def address_signal_expr(text_col: str) -> Column:
    """Boolean Column: True iff the text shows any cheap address signal.

    Pure codegen (`lower` + `rlike` with a foldable pattern) — no
    Python, no join, no shuffle; safe to evaluate inline in the scan
    projection of a 10^12-row table.
    """
    return F.lower(F.col(text_col)).rlike(SIGNAL_PATTERN)
