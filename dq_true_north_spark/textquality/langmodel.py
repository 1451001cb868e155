"""Frozen character n-gram language models — langid + per-language
perplexity share one model built deterministically at import time.

No external downloads (fastText/KenLM are the inspiration, not a dependency
— BASELINE.json north_star: "fastText-style langid (hashed char-n-gram
linear model, deterministic, trained/frozen at build time)"). Seed text per
language is embedded below; the "training" is plain count-and-normalize, so
every process — Spark executor UDF, golden generator, test — derives the
exact same tables.

Execution is BATCH-vectorized (input_hint: "no per-row Python"): a whole
Arrow batch is encoded into one codepoint array; per-document n-gram
log-prob sums come from `np.add.reduceat` over document segment boundaries.
reduceat sums each segment independently and sequentially, so results are
bit-identical whatever the batch composition — determinism across
partitionings holds exactly (SURVEY.md §7 hard-point 3). The scalar
`classify`/`perplexity` used by the golden generator delegate to the same
batch kernel with a batch of one.

Executor-side lifecycle: module-level singletons, built once per Python
worker at import (SURVEY.md §7 hard-point 4).
"""

from __future__ import annotations

import numpy as np

N_BUCKETS = 1 << 16          # hashed trigram space
_PPL_DIM = 128               # ASCII-clamped char-bigram table
_CAP = 2000                  # chars examined per document
_TEMP = 4.0                  # softmax temperature calibrated so
# mixed-language docs fall below constants.MIN_LANG_CONFIDENCE while clean
# docs stay above

# Seed corpora: function words + characteristic diacritics per language.
# These drive BOTH langid discrimination and per-language perplexity.
SEED_TEXT = {
    "en": (
        "the be to of and a in that have i it for not on with he as you do "
        "at this but his by from they we say her she or an will my one all "
        "would there their what so up out if about who get which go me when "
        "make can like time no just him know take people into year your good "
        "some could them see other than then now look only come its over "
        "think also back after use two how our work first well way even new "
        "want because any these give day most us report market data news "
    ),
    "fr": (
        "le la les de des et un une est été être avec pour dans sur que qui "
        "ne pas se ce il elle nous vous ils elles au aux du mais ou donc car "
        "si mon ton son notre votre leur cette ces très plus moins aussi "
        "comme tout toute tous toutes faire dire voir savoir pouvoir vouloir "
        "marché économie société année après déjà où çà français général "
    ),
    "es": (
        "el la los las de y un una es está con para en que no se lo le da "
        "su por son como más pero sus al del los nos ya o este sí porque "
        "esta entre cuando muy sin sobre también me hasta hay donde quien "
        "desde todo nos durante todos uno les ni contra otros ese eso ante "
        "señor año niño español información nación situación región así "
    ),
    "de": (
        "der die das und ein eine ist mit für von zu den dem des im am auf "
        "nicht sich auch es an werden aus er hat dass sie nach wird bei "
        "einer um noch wie einem über einen so zum war haben nur oder aber "
        "vor zur bis mehr durch man sein wurde sei straße größe können müssen "
        "für über während deutschland jahr prozent unternehmen entwicklung "
    ),
    "zh": (
        "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他 时 来 "
        "用 们 生 到 作 地 于 出 就 分 对 成 会 可 主 发 年 动 同 工 也 能 "
        "下 过 子 说 产 种 面 而 方 后 多 定 行 学 法 所 民 得 经 十 三 之 "
        "进 着 等 部 度 家 电 力 里 如 水 化 高 自 二 理 起 小 物 现 实 加 "
    ),
    # trained but NOT in constants.ALLOWED_LANGS — exercises the
    # lang_not_allowed drop reason end-to-end
    "it": (
        "il lo la i gli le di a da in con su per tra fra un uno una è sono "
        "che non si come più anche qui perché così dopo senza questo quella "
        "essere avere fare dire andare può già però quando dove mentre anni "
        "città perché università società qualità governo mercato economia "
    ),
}

LANGS = tuple(SEED_TEXT)


def _trigram_ids(codes: np.ndarray) -> np.ndarray:
    if codes.size < 3:
        return np.empty(0, dtype=np.int64)
    c = codes.astype(np.int64)
    return (c[:-2] * 131 * 131 + c[1:-1] * 131 + c[2:]) % N_BUCKETS


def _build():
    lang_tables = {}
    ppl_tables = {}
    for lang, seed in SEED_TEXT.items():
        seed_codes = np.frombuffer(
            (seed * 4).lower().encode("utf-32-le"), dtype=np.uint32
        )
        counts = np.ones(N_BUCKETS, dtype=np.float64)
        np.add.at(counts, _trigram_ids(seed_codes), 4.0)
        lang_tables[lang] = np.log(counts / counts.sum()).astype(np.float32)

        clamped = np.minimum(seed_codes, _PPL_DIM - 1).astype(np.int64)
        bids = clamped[:-1] * _PPL_DIM + clamped[1:]
        bcounts = np.ones(_PPL_DIM * _PPL_DIM, dtype=np.float64)
        np.add.at(bcounts, bids, 16.0)
        ppl_tables[lang] = np.log(bcounts / bcounts.sum()).astype(np.float32)
    return lang_tables, ppl_tables


_LANG_TABLES, _PPL_TABLES = _build()
_LANG_IDX = {lang: i for i, lang in enumerate(LANGS)}


def _encode_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate capped+lowercased texts into one codepoint array.
    Returns (codes, offsets) with offsets of length D+1."""
    capped = [(t or "")[:_CAP].lower() for t in texts]
    joined = "".join(capped)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(c) for c in capped), dtype=np.int64, count=len(capped))
    offsets = np.concatenate([[0], np.cumsum(lens)])
    return codes, offsets


def _segment_sums(values: np.ndarray, offsets: np.ndarray, tail: int) -> np.ndarray:
    """Per-document sums of an n-gram value array laid out contiguously,
    where each boundary loses `tail` positions (already zeroed by caller).
    Empty/overflowing segments yield 0."""
    n = values.size
    d = len(offsets) - 1
    if n == 0:
        return np.zeros(d, dtype=np.float64)
    starts = np.minimum(offsets[:-1], n - 1).astype(np.int64)
    sums = np.add.reduceat(values, starts)
    # reduceat returns a[start] for empty segments; zero them out
    counts = np.maximum(offsets[1:] - offsets[:-1] - tail, 0)
    valid_start = offsets[:-1] < n
    return np.where((counts > 0) & valid_start, sums, 0.0)


def analyze_batch(texts: list[str]) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Vectorized (pred_lang, confidence, perplexity-under-pred-lang) for a
    whole batch. One encode, 6+6 table gathers, reduceat segment sums."""
    d = len(texts)
    if d == 0:
        return [], np.empty(0), np.empty(0)
    codes, offsets = _encode_batch(texts)
    n = codes.size
    tri = _trigram_ids(codes)
    # zero out trigrams crossing document boundaries
    tri_lp_mask = np.ones(tri.size, dtype=np.float64)
    inner = offsets[1:-1]
    for shift in (1, 2):
        idx = inner - shift
        idx = idx[(idx >= 0) & (idx < tri.size)]
        tri_lp_mask[idx] = 0.0
    counts3 = np.maximum(offsets[1:] - offsets[:-1] - 2, 0).astype(np.float64)

    scores = np.full((len(LANGS), d), -1e30, dtype=np.float64)
    for li, lang in enumerate(LANGS):
        lp = _LANG_TABLES[lang][tri].astype(np.float64) * tri_lp_mask
        s = _segment_sums(lp, offsets, tail=2)
        with np.errstate(invalid="ignore", divide="ignore"):
            scores[li] = np.where(counts3 > 0, s / np.maximum(counts3, 1), -1e30)

    best = scores.argmax(axis=0)
    z = scores - scores.max(axis=0, keepdims=True)
    p = np.exp(np.maximum(z * _TEMP, -700.0))
    conf = p.max(axis=0) / p.sum(axis=0)

    # char-bigram perplexity under each doc's PREDICTED language
    clamped = np.minimum(codes, _PPL_DIM - 1).astype(np.int64)
    big = clamped[:-1] * _PPL_DIM + clamped[1:] if n >= 2 else np.empty(0, dtype=np.int64)
    big_mask = np.ones(big.size, dtype=np.float64)
    idx = inner - 1
    idx = idx[(idx >= 0) & (idx < big.size)]
    big_mask[idx] = 0.0
    counts2 = np.maximum(offsets[1:] - offsets[:-1] - 1, 0).astype(np.float64)
    bsums = np.zeros((len(LANGS), d), dtype=np.float64)
    for li, lang in enumerate(LANGS):
        lp = _PPL_TABLES[lang][big].astype(np.float64) * big_mask
        bsums[li] = _segment_sums(lp, offsets, tail=1)
    chosen = bsums[best, np.arange(d)]
    with np.errstate(over="ignore"):
        ppl = np.where(
            counts2 > 0,
            np.exp(np.minimum(-chosen / np.maximum(counts2, 1), 700.0)),
            np.inf,
        )

    langs = [LANGS[b] if counts3[i] > 0 else "und" for i, b in enumerate(best)]
    conf = np.where(counts3 > 0, conf, 0.0)
    return langs, conf, ppl


def ppl_batch(texts: list[str], langs: list[str]) -> np.ndarray:
    """Perplexity under a GIVEN language per document (vectorized)."""
    d = len(texts)
    if d == 0:
        return np.empty(0)
    codes, offsets = _encode_batch(texts)
    clamped = np.minimum(codes, _PPL_DIM - 1).astype(np.int64)
    big = clamped[:-1] * _PPL_DIM + clamped[1:] if codes.size >= 2 else np.empty(0, dtype=np.int64)
    big_mask = np.ones(big.size, dtype=np.float64)
    inner = offsets[1:-1]
    idx = inner - 1
    idx = idx[(idx >= 0) & (idx < big.size)]
    big_mask[idx] = 0.0
    counts2 = np.maximum(offsets[1:] - offsets[:-1] - 1, 0).astype(np.float64)
    lang_rows = np.array(
        [_LANG_IDX.get(lang, _LANG_IDX["en"]) for lang in langs], dtype=np.int64
    )
    out = np.empty(d, dtype=np.float64)
    for li in np.unique(lang_rows):
        lp = _PPL_TABLES[LANGS[li]][big].astype(np.float64) * big_mask
        sums = _segment_sums(lp, offsets, tail=1)
        sel = lang_rows == li
        with np.errstate(over="ignore"):
            out[sel] = np.where(
                counts2[sel] > 0,
                np.exp(np.minimum(-sums[sel] / np.maximum(counts2[sel], 1), 700.0)),
                np.inf,
            )
    return out


def classify(text: str) -> tuple[str, float]:
    """Scalar reference path (golden generator) — same kernel, batch of 1."""
    langs, conf, _ = analyze_batch([text])
    return langs[0], float(conf[0])


def perplexity(text: str, lang: str) -> float:
    """Char-bigram perplexity under the (predicted) language's model."""
    return float(ppl_batch([text], [lang])[0])
