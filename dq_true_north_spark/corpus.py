"""Deterministic Common-Crawl-style page generator (FIXTURES.md §B).

Schema per BASELINE.json input_hint:
    url string, warc_ts timestamp, html binary, text string, lang string

Planted defect classes (i mod 20) — each maps to exactly one golden drop
reason or scrub case, so end-to-end F1 is attributable per rule:

    0 too_short        5 bullet lines       10 PII + lexicon (scrub only)
    1 symbol spam      6 dup lines          11 Italian (lang_not_allowed)
    2 no stopwords     7 exact dup of #8    12 mixed-lang (low confidence)
    3 digits only      8 clean (dup anchor) 13 duplicate url of #8
    4 ellipsis lines   9 gibberish (ppl)    14-19 clean multilingual

Generation is per-index seeded (seed ⊕ index), so ANY partitioning of the
index range yields identical rows — the Spark path distributes via
mapInPandas over spark.range(n) and is deterministic at any parallelism,
while the golden generator materializes the same rows in plain pandas.
Host distribution plants skew: ~30% of pages land on 2 hot hosts
(constants.HOT_HOSTS) to exercise salted repartitioning.
"""

from __future__ import annotations

import datetime
import random
from collections.abc import Iterator

import pandas as pd

from . import constants as C
from .textquality.langmodel import SEED_TEXT

_VOCAB = {lang: seed.split() for lang, seed in SEED_TEXT.items()}
_EN_CONTENT = (
    "market data report stock price trade value index growth quarter "
    "revenue sector analyst forecast earnings supply demand export import"
).split()
_BASE_TS = datetime.datetime(2024, 3, 1, 0, 0, 0)
_LANG_POOL = ("en", "en", "en", "fr", "es", "de", "zh")

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _words(rng: random.Random, lang: str, n: int) -> list[str]:
    vocab = _VOCAB[lang]
    return [vocab[rng.randrange(len(vocab))] for _ in range(n)]


def _lines(words: list[str], per_line: int = 12) -> str:
    return "\n".join(
        " ".join(words[i : i + per_line]) for i in range(0, len(words), per_line)
    )


def _base_text(i: int, lang: str) -> str:
    rng = random.Random(C.CORPUS_SEED * 1_000_003 + i)
    return _lines(_words(rng, lang, 30 + rng.randrange(90)))


def _lang_for(i: int) -> str:
    cls = i % 20
    if cls == 11:
        return "it"
    return _LANG_POOL[(i * 2654435761) % len(_LANG_POOL)]


def _gen_row(i: int) -> tuple[str, datetime.datetime, bytes, str, str]:
    rng = random.Random(C.CORPUS_SEED + i)
    cls = i % 20
    lang = _lang_for(i)

    if cls == 0:
        text = " ".join(_words(rng, lang, 5))
    elif cls == 1:
        ws = _words(rng, lang, 60)
        text = _lines([w + "###" if j % 3 == 0 else w for j, w in enumerate(ws)])
    elif cls == 2:
        text = _lines([_EN_CONTENT[rng.randrange(len(_EN_CONTENT))] for _ in range(60)])
        lang = "en"
    elif cls == 3:
        text = _lines([str(rng.randrange(10_000_000)) for _ in range(60)])
    elif cls == 4:
        ws = _words(rng, lang, 60)
        text = "\n".join(
            " ".join(ws[k : k + 10]) + "..." for k in range(0, 60, 10)
        )
    elif cls == 5:
        ws = _words(rng, lang, 60)
        text = "\n".join("- " + " ".join(ws[k : k + 10]) for k in range(0, 60, 10))
    elif cls == 6:
        line = " ".join(_words(rng, lang, 10))
        text = "\n".join([line] * 8)
    elif cls == 7:
        anchor = i + 1  # the class-8 doc in the same block
        lang = _lang_for(anchor)
        text = _base_text(anchor, lang)
    elif cls == 9:
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        text = _lines(
            [
                "".join(alphabet[rng.randrange(26)] for _ in range(5 + rng.randrange(5)))
                for _ in range(60)
            ]
        )
    elif cls == 10:
        ws = _words(rng, "en", 50)
        ws[5:5] = ["reach", "us", "at", "john.doe@example.com", "or"]
        ws[20:20] = ["call", "+1-555-123-4567", "office", "ip", "192.168.1.10"]
        ws[35:35] = ["ssn", "123-45-6789", "notes", "badword", "and", "SlurTerm"]
        text = _lines(ws)
        lang = "en"
    elif cls == 12:
        half = _words(rng, "en", 30) + _words(rng, "fr", 30)
        rng.shuffle(half)
        text = _lines(half)
        lang = "en"
    else:  # 8, 11, 13, 14-19: normal text in the doc's language
        text = _base_text(i, lang)

    if cls == 13:
        url_i = i + 15  # reuse the url of a doc in the NEXT block (class 8)
        cls13_anchor = url_i - (url_i % 20) + 8
        url = _url_for(cls13_anchor)
    else:
        url = _url_for(i)

    ts = _BASE_TS + datetime.timedelta(seconds=i * 137)
    html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
    return (url, ts, html, text, lang)


def _url_for(i: int) -> str:
    rng = random.Random(C.CORPUS_SEED * 31 + i)
    if rng.random() < 0.30:
        host = C.HOT_HOSTS[i % len(C.HOT_HOSTS)]
    else:
        host = f"host{rng.randrange(100)}.example.org"
    return f"https://{host}/page-{i:08d}.html"


def generate_pages_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """Driver-side/golden path: materialize rows [start, start+n)."""
    rows = [_gen_row(i) for i in range(start, start + n)]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


def pages_df(spark, n: int, partitions: int = 32):
    """Distributed path: spark.range → mapInPandas, per-index seeded so the
    result is identical at any partitioning (determinism across parallelism,
    SURVEY.md §7 hard-point 3)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield pd.DataFrame(
                [_gen_row(int(i)) for i in ids],
                columns=["url", "warc_ts", "html", "text", "lang"],
            )

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def n_pages_for_sf(sf_dir: str) -> int:
    if "0.001" in sf_dir:
        return 2_000
    if "0.01" in sf_dir:
        return 10_000
    return 50_000
