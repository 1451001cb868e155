"""Golden-fixture generator: the frozen reference implementation of the
quality filter, in plain Python over pandas rows.

Heuristics are INDEPENDENTLY re-implemented here (python `re` + counters,
not the SQL spec), so the pipeline-vs-golden F1 check exercises the Spark
expressions for real. The model-based stages (langid, perplexity) and scrub
share the frozen modules — the golden generator IS the reference
implementation per SURVEY.md §7 hard-point 2.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from dq_true_north_spark import constants as C
from dq_true_north_spark.textquality import langmodel
from dq_true_north_spark.textquality.scrub import scrub_text

_WORD_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_SYMBOL_RE = re.compile(r"[#…]")
_STOPSET = set(C.STOPWORDS)


def _r4(v: float) -> float:
    """Mirror of spec.round4: floor(x*1e4+0.5)/1e4 — bit-identical to the
    Spark/DuckDB rendering (Python round() is half-even and disagrees at
    decimal half-boundaries)."""
    return math.floor(v * 1e4 + 0.5) / 1e4



def heuristic_reasons(text: str) -> list[str]:
    words = _WORD_RE.findall(text)
    nw = len(words)
    reasons = []
    if nw < C.MIN_WORDS:
        reasons.append(C.REASON_TOO_SHORT)
    if nw > C.MAX_WORDS:
        reasons.append(C.REASON_TOO_LONG)
    mwl = _r4(sum(len(w) for w in words) / nw) if nw else None
    if mwl is not None and (mwl < C.MIN_MEAN_WORD_LEN or mwl > C.MAX_MEAN_WORD_LEN):
        reasons.append(C.REASON_MEAN_WORD_LEN)
    if nw and _r4(len(_SYMBOL_RE.findall(text)) / nw) > C.MAX_SYMBOL_WORD_RATIO:
        reasons.append(C.REASON_SYMBOL_RATIO)
    low = [w.lower() for w in words]
    n_stop = sum(1 for w in low if w in _STOPSET)
    distinct_stop = len({w for w in low if w in _STOPSET})
    frac_low = nw > 0 and _r4(n_stop / nw) < C.MIN_STOPWORD_FRACTION
    if frac_low or distinct_stop < C.MIN_DISTINCT_STOPWORDS:
        reasons.append(C.REASON_STOPWORDS)
    n_alpha = sum(1 for w in words if _ALPHA_RE.search(w))
    if nw and _r4((nw - n_alpha) / nw) > C.MAX_NON_ALPHA_WORD_FRACTION:
        reasons.append(C.REASON_NON_ALPHA)
    lines = [ln for ln in text.split("\n") if ln != ""]
    if lines:
        if _r4(sum(1 for ln in lines if ln.endswith("...")) / len(lines)) > C.MAX_ELLIPSIS_LINE_FRACTION:
            reasons.append(C.REASON_ELLIPSIS)
        bullet = sum(
            1 for ln in lines
            if ln.startswith("- ") or ln.startswith("* ") or ln.startswith("•")
        )
        if _r4(bullet / len(lines)) > C.MAX_BULLET_LINE_FRACTION:
            reasons.append(C.REASON_BULLET)
        dup_frac = _r4(1.0 - len(set(lines)) / len(lines))
        if dup_frac > C.MAX_DUP_LINE_FRACTION:
            reasons.append(C.REASON_DUP_LINES)
    return reasons


def golden_verdicts(pages: pd.DataFrame) -> pd.DataFrame:
    """url, keep, drop_reasons (ordered), scrubbed_text — the fixtures."""
    # keep-first exact dedup on md5(text), tie-break (warc_ts, url)
    hashes = pages["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    order = pages.assign(_h=hashes).sort_values(["_h", "warc_ts", "url"])
    first_seen: set[str] = set()
    is_dup = []
    for h in order["_h"]:
        is_dup.append(h in first_seen)
        first_seen.add(h)
    dup_by_idx = pd.Series(is_dup, index=order.index)

    rows = []
    for idx, r in pages.iterrows():
        text = r["text"]
        pred, conf = langmodel.classify(text)
        ppl = round(langmodel.perplexity(text, pred), 4)
        raw = heuristic_reasons(text)
        reasons = [
            x for x in raw
            if not (
                (x in (C.REASON_MEAN_WORD_LEN, C.REASON_NON_ALPHA)
                 and pred not in C.LATIN_LANGS)
                or (x == C.REASON_STOPWORDS and pred != "en")
            )
        ]
        if dup_by_idx.loc[idx]:
            reasons.append(C.REASON_EXACT_DUP)
        if pred not in C.ALLOWED_LANGS:
            reasons.append(C.REASON_BAD_LANG)
        if round(conf, 6) < C.MIN_LANG_CONFIDENCE:
            reasons.append(C.REASON_LANG_CONF)
        if ppl > C.MAX_PERPLEXITY:
            reasons.append(C.REASON_PERPLEXITY)
        ordered = [x for x in C.DROP_REASON_ORDER if x in reasons]
        rows.append(
            (r["url"], r["warc_ts"], len(ordered) == 0, ordered,
             scrub_text(text), pred, conf, ppl)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "url", "warc_ts", "keep", "drop_reasons", "scrubbed_text",
            "pred_lang", "lang_confidence", "perplexity",
        ],
    )
