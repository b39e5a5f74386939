"""Learned NER backend for T10: an averaged-perceptron BIO tagger.

The reference's Stage 5 is a trained spaCy pipeline
(``src/core/stages/spacy_ner.py:34-47``) over 8 span labels
(HOUSE/ROAD/AREA/DISTRICT/POSTAL/FLAT/FLOOR/BLOCK, label map
``:68-88``) trained from ``data/training/spacy_training_data.json``
(1,281 labeled examples). spaCy is not installed in this container, so
this module provides a dependency-free equivalent: a greedy averaged
perceptron (Collins 2002) over hand-rolled token features with BIO
constraints — the same model family spaCy's original tagger and
nltk's PerceptronTagger use. Training is offline and deterministic
(``tools/train_ner.py``); the serialized weights ship in the package
(``data/ner_weights.json.gz``) and are loaded once per executor
process, never per row.

Everything here is pure Python over short strings (median mention is
~57 chars), executed inside Arrow-batched ``mapInPandas`` — the same
slow-path budget the SURVEY allots to the reference-mandated ML stage.

Tokenization, features and decoding live in this one module so the
trainer and the executor runtime can never diverge.
"""

from __future__ import annotations

import gzip
import json
import os
import re

# tokens: digit runs (ASCII or Bangla), letter runs, single punctuation
_TOKEN_RE = re.compile(r"[0-9০-৯]+|[^\W\d_]+|[^\w\s]", re.UNICODE)

_DIGITS = set("0123456789০১২৩৪৫৬৭৮৯")

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "ner_weights.json.gz",
)


def tokenize(text: str) -> list[tuple[str, int, int]]:
    """→ [(token, char_start, char_end)] with offsets into ``text``."""
    return [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def _shape(w: str) -> str:
    """Collapsed character-class shape: 'Dhaka-1207' → 'x-d'."""
    out: list[str] = []
    for ch in w:
        if ch in _DIGITS:
            c = "d"
        elif "ঀ" <= ch <= "৿":
            c = "b"
        elif ch.isalpha():
            c = "x"
        else:
            c = ch
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def _gazetteer_tokens() -> tuple[frozenset, frozenset]:
    """(district_tokens, area_tokens) from the package's own dims —
    membership features let the tagger generalize to place names it
    never saw in the 1,281 training examples (the same role spaCy's
    pretrained vectors play in the reference's pipeline)."""
    global _GAZ
    if _GAZ is None:
        from ..data import gazetteer as G

        dist = set()
        for name, _ in G.DISTRICT_DIVISION + G.BANGLA_DISTRICTS + G.DISTRICT_VARIANTS:
            for tok, _s, _e in tokenize(name.lower()):
                dist.add(tok)
        area = set()
        for name, _d, _p in G.AREAS:
            for tok, _s, _e in tokenize(name.lower()):
                area.add(tok)
        for variant, _canon in G.AREA_VARIANTS:
            for tok, _s, _e in tokenize(variant.lower()):
                area.add(tok)
        _GAZ = (frozenset(dist), frozenset(area))
    return _GAZ


_GAZ: tuple[frozenset, frozenset] | None = None


def features(
    words: list[str], i: int, prev_tag: str, prev2_tag: str
) -> list[str]:
    """Feature strings for position ``i``; greedy-decode conditioning
    enters through ``prev_tag``/``prev2_tag`` (predicted history)."""
    w = words[i]
    lw = w.lower()
    prev = words[i - 1].lower() if i > 0 else "<s>"
    prev2 = words[i - 2].lower() if i > 1 else "<s>"
    nxt = words[i + 1].lower() if i + 1 < len(words) else "</s>"
    nxt2 = words[i + 2].lower() if i + 2 < len(words) else "</s>"
    is_digit = "1" if w and all(c in _DIGITS for c in w) else "0"
    dist_toks, area_toks = _gazetteer_tokens()
    gz = ("1" if lw in dist_toks else "0") + ("1" if lw in area_toks else "0")
    pos = str(i * 3 // max(len(words), 1))  # text tercile (postals sit late)
    return [
        "b",  # bias
        "w=" + lw,
        "s3=" + lw[-3:],
        "s2=" + lw[-2:],
        "p1=" + lw[:1],
        "sh=" + _shape(w),
        "d=" + is_digit + ":" + str(min(len(w), 6)),
        "pw=" + prev,
        "p2w=" + prev2,
        "nw=" + nxt,
        "n2w=" + nxt2,
        "pw+w=" + prev + "|" + lw,
        "w+nw=" + lw + "|" + nxt,
        "pt=" + prev_tag,
        "pt2=" + prev2_tag + "|" + prev_tag,
        "pt+w=" + prev_tag + "|" + lw,
        "pt+sh=" + prev_tag + "|" + _shape(w),
        "i0=" + ("1" if i == 0 else "0"),
        "iN=" + ("1" if i == len(words) - 1 else "0"),
        "gz=" + gz,
        "gz+pt=" + gz + "|" + prev_tag,
        "pos=" + pos,
        "pos+d=" + pos + "|" + is_digit,
    ]


class PerceptronNER:
    """Greedy BIO decoder over a {feature: {tag: weight}} table.

    Decoding is fully deterministic: argmax ties break on the tag
    list's fixed order, and I-X is only reachable after B-X/I-X (the
    standard BIO constraint), otherwise the arc is masked out.
    """

    def __init__(self, tags: list[str], weights: dict[str, dict[str, float]]):
        self.tags = tags
        self.weights = weights

    def _scores(self, feats: list[str]) -> dict[str, float]:
        scores = dict.fromkeys(self.tags, 0.0)
        w = self.weights
        for f in feats:
            row = w.get(f)
            if row:
                for tag, wt in row.items():
                    scores[tag] += wt
        return scores

    def tag(self, words: list[str]) -> list[str]:
        out: list[str] = []
        prev, prev2 = "<s>", "<s>"
        for i in range(len(words)):
            scores = self._scores(features(words, i, prev, prev2))
            best_tag, best = None, None
            for t in self.tags:  # fixed order → deterministic ties
                if t.startswith("I-") and prev[2:] != t[2:]:
                    continue  # BIO constraint: I-X needs B-X/I-X before it
                s = scores[t]
                if best is None or s > best:
                    best_tag, best = t, s
            out.append(best_tag or "O")
            prev2, prev = prev, out[-1]
        return out

    def spans(self, text: str) -> list[tuple[str, str]]:
        """→ [(LABEL, surface)] in first-occurrence order, surfaces
        sliced from the original text (reference takes ``ent.text``)."""
        toks = tokenize(text)
        if not toks:
            return []
        tags = self.tag([t[0] for t in toks])
        out: list[tuple[str, str]] = []
        i = 0
        while i < len(tags):
            if tags[i].startswith("B-"):
                label = tags[i][2:]
                j = i + 1
                while j < len(tags) and tags[j] == "I-" + label:
                    j += 1
                out.append((label, text[toks[i][1] : toks[j - 1][2]].strip()))
                i = j
            else:
                i += 1
        return out


def load_model(path: str | None = None) -> PerceptronNER:
    with gzip.open(path or WEIGHTS_PATH, "rt", encoding="utf-8") as fh:
        blob = json.load(fh)
    return PerceptronNER(blob["tags"], blob["weights"])


_CACHED: dict[str, PerceptronNER] = {}


def shared_model(path: str | None = None) -> PerceptronNER:
    """Process-level singleton keyed by weights path: Spark reuses
    Python workers across Arrow batches AND tasks, so the weight table
    deserializes once per executor process, not once per task — for
    explicit paths too, not only the bundled default."""
    key = path or WEIGHTS_PATH
    if key not in _CACHED:
        _CACHED[key] = load_model(key)
    return _CACHED[key]
