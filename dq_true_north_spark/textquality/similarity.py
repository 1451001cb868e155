"""Embedding similarity search over array<float> columns.

Two paths, per the training-pipeline requirements:
  1. brute-force cosine top-k — exact baseline. Query set is a broadcast
     small side (a handful of probe vectors), so the "join" is a broadcast
     nested loop over ONE scan of the corpus; dot products are JVM-side
     higher-order functions (zip_with + aggregate), no Python.
  2. LSH-bucketed ANN — the scale path: 16 seeded random hyperplanes give a
     16-bit bucket id per vector (again pure column expressions); neighbor
     candidates come from a bucket-equijoin (shuffle on bucket id, each
     bucket ~ n/65536 of the corpus), then exact cosine re-rank in-bucket.

Determinism: hyperplanes derive from a fixed seed; ranking ties broken by
vec_id (SURVEY.md §7 hard-point 3).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import constants as C
from .spec import round4_col


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_filter: str,
    k: int = C.COSINE_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for every query vector (rows matching
    query_filter). Queries are broadcast; corpus is scanned once."""
    # norms are hoisted into each side's projection BEFORE the join — one
    # aggregate per vector instead of Q× per corpus row (VERDICT r2 #3; the
    # same shape embedding_near_dup_pairs already used)
    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("qnorm"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        _norm(vec_col).alias("nnorm"),
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cosine_sim",
        _dot("qvec", "nvec") / (F.col("qnorm") * F.col("nnorm")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            round4_col(F.col("cosine_sim")).alias("cosine_sim"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    rng = random.Random(C.CORPUS_SEED * 7919 + table * 104729)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def with_lsh_bucket(
    df: DataFrame, dim: int, vec_col: str = "embedding",
    n_planes: int = C.LSH_COSINE_PLANES, table: int = 0,
    out_col: str = "bucket",
) -> DataFrame:
    """Adds `out_col`: an n_planes-bit signature from seeded hyperplane
    signs — pure column expressions, evaluated in codegen."""
    planes = _hyperplanes(dim, n_planes, table)
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        bit = (_dot(vec_col, "__plane") > 0).cast("long")
        df = df.withColumn("__plane", arr)
        df = df.withColumn(f"__bit_{j}", bit).drop("__plane")
        bucket = bucket + F.col(f"__bit_{j}") * F.lit(1 << j).cast("long")
    df = df.withColumn(out_col, bucket)
    for j in range(len(planes)):
        df = df.drop(f"__bit_{j}")
    return df


def ann_lsh_topk(
    embeddings: DataFrame,
    dim: int,
    query_filter: str,
    k: int = C.COSINE_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH (OR-construction:
    n_tables independent hash tables of n_planes bits; candidate = shares a
    bucket in ANY table). Exact cosine re-rank over the candidate union.
    Recall/latency trade against cosine_topk is measured in bench.py.

    Plan shape: bucket bits are codegen'd expressions; the candidate join
    shuffles on (table_id, bucket) — each bucket holds ~n/2^n_planes docs,
    so skew is bounded by construction."""
    tagged = embeddings.withColumn("__nrm", _norm(vec_col))
    for t in range(n_tables):
        tagged = with_lsh_bucket(
            tagged, dim, vec_col, n_planes, table=t, out_col=f"__b{t}"
        )
    buckets = F.array(*[F.col(f"__b{t}") for t in range(n_tables)])
    b = tagged.select(
        F.col(id_col), F.col(vec_col), F.col("__nrm"),
        F.posexplode(buckets).alias("table_id", "bucket"),
    )
    q = b.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("__nrm").alias("qnorm"),
        F.col("table_id").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    c = b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        F.col("__nrm").alias("nnorm"),
        "table_id", "bucket",
    )
    joined = (
        c.join(
            F.broadcast(q),
            (F.col("table_id") == F.col("qtable"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = joined.withColumn(
        "cosine_sim", _dot("qvec", "nvec") / (F.col("qnorm") * F.col("nnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            round4_col(F.col("cosine_sim")).alias("cosine_sim"),
        )
    )


# ------------------------------------------------------------------ IVF -----


def ivf_train_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
) -> DataFrame:
    """Coarse quantizer for IVF: k-means via Lloyd iterations written
    entirely in DataFrame ops (no MLlib dependency, no driver-side vectors
    beyond the k centroids themselves, which are broadcast every round).

    Per round: assign (cross join with the BROADCAST k-row centroid table,
    argmax cosine) → recompute (posexplode to (cell, dim_pos, val), one
    hash aggregate, re-assemble arrays). Initialization is the k smallest
    ids — deterministic; float summation order inside avg() is not, so
    centroids are stable only to ~1 ulp and consumers must treat cell
    assignment as approximate (which IVF is by definition).
    """
    vecs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    w0 = Window.orderBy("vid")
    centroids = (
        vecs.orderBy("vid").limit(n_cells)
        .select((F.row_number().over(w0) - 1).alias("cell"), F.col("v").alias("c"))
    )
    for _ in range(iters):
        assigned = _assign_cells(vecs, centroids)
        centroids = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
                .alias("c")
            )
        ).localCheckpoint(eager=True)   # cut the iterative lineage
    return centroids


def _assign_cells(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmax-cosine cell per vector; ties broken by cell id. Norms are
    hoisted to one per vector / one per centroid — not recomputed per
    (vector, centroid) pair (VERDICT r2 #3 discipline)."""
    v = vecs.withColumn("__vn", _norm("v"))
    c = centroids.withColumn("__cn", _norm("c"))
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "sim", _dot("v", "c") / (F.col("__vn") * F.col("__cn"))
    )
    w = Window.partitionBy("vid").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", "v", "cell")
    )


def _query_probes(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_filter: str,
    id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """(query_id, qvec, qnorm, cell) — each query's n_probe nearest cells.
    The filter is applied against the ORIGINAL column names (never rewritten
    by string surgery), then the id is aliased for the internal frames."""
    qvecs = embeddings.filter(query_filter).select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("__qn", _norm("v"))
    c = centroids.withColumn("__cn", _norm("c"))
    qscored = qvecs.crossJoin(F.broadcast(c)).withColumn(
        "sim", _dot("v", "c") / (F.col("__qn") * F.col("__cn"))
    )
    wq = Window.partitionBy("vid").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qvec"),
            F.col("__qn").alias("qnorm"),
            "cell",
        )
    )


def ivf_write_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 3,
) -> None:
    """Materialize the IVF index: the inverted file (vid, v, cell) written
    as parquet PARTITIONED BY cell under `path`/inverted, and the trained
    centroids under `path`/centroids. Built once per corpus; queries then
    read ONLY their probed cells' partition directories (Spark prunes on
    the static `cell IN (...)` filter) — n_probe/n_cells of the bytes
    instead of recomputing the assignment per run (VERDICT r2 #5)."""
    centroids = ivf_train_centroids(
        embeddings, n_cells, id_col, vec_col, train_iters
    )
    vecs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    index = _assign_cells(vecs, centroids)
    index.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/inverted"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ann_ivf_topk(
    embeddings: DataFrame,
    query_filter: str,
    k: int = C.COSINE_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    n_probe: int = 4,
    train_iters: int = 3,
    index_path: str | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbors — the inverted-file counterpart to
    ann_lsh_topk: train a k-means coarse quantizer, index every vector into
    its nearest cell, then for each query scan only its n_probe nearest
    cells and exact-rerank.

    index_path=None recomputes the assignment in-memory (fine for small
    inputs / tests). With index_path (written by `ivf_write_index`) the
    trained centroids and the cell-partitioned inverted file are READ
    instead: the probed cell ids are resolved first (a tiny
    queries×centroids job) and the inverted-file scan carries a static
    `cell IN (...)` partition filter, so only n_probe/n_cells of the corpus
    bytes are touched — the actual at-scale contract of an IVF index."""
    spark = embeddings.sparkSession
    if index_path is not None:
        centroids = spark.read.parquet(f"{index_path}/centroids")
        # materialize the (tiny, broadcast-bound) probe table once — the
        # cell-id collect below and the candidate join both reuse it
        # instead of re-running the queries×centroids job twice
        probes = _query_probes(
            embeddings, centroids, query_filter, id_col, vec_col, n_probe
        ).localCheckpoint(eager=True)
        # tiny by construction: <= n_queries * n_probe, bounded by n_cells
        probe_cells = sorted(
            {r["cell"] for r in probes.select("cell").distinct().collect()}
        )
        index = spark.read.parquet(f"{index_path}/inverted").filter(
            F.col("cell").isin(probe_cells)       # partition pruning
        )
    else:
        centroids = ivf_train_centroids(
            embeddings, n_cells, id_col, vec_col, train_iters
        )
        vecs = embeddings.select(
            F.col(id_col).alias("vid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
        )
        index = _assign_cells(vecs, centroids)      # the inverted file
        probes = _query_probes(
            embeddings, centroids, query_filter, id_col, vec_col, n_probe
        )

    cand = index.withColumn("__vn", _norm("v")).join(
        F.broadcast(probes), "cell"
    ).filter(F.col("vid") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine_sim", _dot("qvec", "v") / (F.col("qnorm") * F.col("__vn"))
    ).dropDuplicates(["query_id", "vid"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            "rank",
            round4_col(F.col("cosine_sim")).alias("cosine_sim"),
        )
    )


# ------------------------------------------------------------------- PQ -----
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011) — the memory-compression ANN path: a
# 64-dim float vector (256 B) becomes m 8-bit codes (m bytes), and query
# scoring is Asymmetric Distance Computation (ADC): per query, a tiny
# m x k lookup table of exact subspace distances; per corpus vector, a SUM
# of m table lookups — no float vectors ever touched at scan time. At
# 10^12 embeddings this is what makes the corpus fit in cluster RAM.


def _pq_subvectors(embeddings: DataFrame, dim: int, m: int,
                   id_col: str, vec_col: str,
                   query_filter: str | None = None) -> DataFrame:
    """(vid, sub_idx, sv) — L2-NORMALIZED vectors split into m contiguous
    subspaces (normalizing first makes squared-L2 ranking equal cosine
    ranking: ||a-b||^2 = 2 - 2cos)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    src = embeddings.filter(query_filter) if query_filter else embeddings
    v = src.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("__n", _norm("v")).select(
        "vid", F.expr("transform(v, x -> x / __n)").alias("v")
    )
    slices = F.array(*[
        F.expr(f"slice(v, {i * sub + 1}, {sub})") for i in range(m)
    ])
    return v.select("vid", F.posexplode(slices).alias("sub_idx", "sv"))


def _sq_dist(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _pq_assign(subs: DataFrame, codebooks: DataFrame) -> DataFrame:
    """argmin-L2 cell per (vid, sub_idx); ties broken by cell id."""
    scored = subs.join(F.broadcast(codebooks), "sub_idx").withColumn(
        "d", _sq_dist("sv", "c")
    )
    w = Window.partitionBy("vid", "sub_idx").orderBy("d", "cell")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", "sub_idx", "sv", "cell")
    )


def pq_train(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    subs: DataFrame | None = None,
) -> DataFrame:
    """Codebooks (sub_idx, cell, c): k-means per subspace, ALL m subspaces
    trained in the same Lloyd jobs (composite (sub_idx, cell) key — m
    sequential trainings would cost m x iters job rounds for no reason).
    Deterministic init: each subspace's k smallest-vid subvectors. Same
    float-avg caveat as ivf_train_centroids: centroids are stable to ~1
    ulp; consumers treat cell assignment as approximate (PQ is)."""
    subs = subs if subs is not None else _pq_subvectors(
        embeddings, dim, m, id_col, vec_col
    ).localCheckpoint(eager=True)   # one corpus scan, not one per Lloyd round
    w0 = Window.partitionBy("sub_idx").orderBy("vid")
    codebooks = (
        subs.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") <= k)
        .select("sub_idx", (F.col("rn") - 1).alias("cell"),
                F.col("sv").alias("c"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _pq_assign(subs, codebooks)
        codebooks = (
            assigned.select("sub_idx", "cell", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub_idx", "cell", "pos")
            .agg(F.avg("val").alias("mu"))
            .groupBy("sub_idx", "cell")
            .agg(F.expr(
                "transform(sort_array(collect_list(struct(pos, mu))), s -> s.mu)"
            ).alias("c"))
        ).localCheckpoint(eager=True)   # cut the iterative lineage
    return codebooks


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subs: DataFrame | None = None,
) -> DataFrame:
    """(vid, codes array<int>) — m bytes of storage per vector at k<=256."""
    if subs is None:
        subs = _pq_subvectors(embeddings, dim, m, id_col, vec_col)
    return (
        _pq_assign(subs, codebooks)
        .groupBy("vid")
        .agg(F.expr(
            "transform(sort_array(collect_list(struct(sub_idx, cell))), s -> s.cell)"
        ).alias("codes"))
    )


def pq_topk(
    embeddings: DataFrame,
    query_filter: str,
    dim: int,
    k: int = C.COSINE_TOPK,
    m: int = 8,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 3,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, rank, cosine_approx). Scoring
    never reads the corpus float vectors — each corpus row contributes m
    (sub_idx, code) lookups into the BROADCAST per-query distance table
    (n_queries x m x n_cells rows, exact subspace distances), summed by
    one partial aggregation. cosine_approx = 1 - d2/2 on normalized
    vectors. Pass pre-trained codebooks/codes in production (built once
    per corpus, like the IVF index); both are derived here when omitted
    so the operator is self-contained at test scale.

    Determinism: GIVEN codebooks/codes, the ranking is partition-order
    independent — the per-pair d2 is a sequential fold over the
    VALUE-SORTED m contributions (an unordered SUM of doubles can flip a
    sub-ulp-separated rank across shuffles), and ties break by
    neighbor_id. Training itself carries the same ~1-ulp float-avg caveat
    as ivf_train_centroids."""
    if codebooks is None or codes is None:
        subs = _pq_subvectors(embeddings, dim, m, id_col, vec_col) \
            .localCheckpoint(eager=True)    # shared by train AND encode
        if codebooks is None:
            codebooks = pq_train(embeddings, dim, m, n_cells, id_col,
                                 vec_col, train_iters, subs=subs)
        if codes is None:
            codes = pq_encode(embeddings, codebooks, dim, m, id_col,
                              vec_col, subs=subs)

    qsubs = _pq_subvectors(embeddings, dim, m, id_col, vec_col, query_filter)
    dist_table = (
        qsubs.join(F.broadcast(codebooks), "sub_idx")
        .select(
            F.col("vid").alias("query_id"), "sub_idx", "cell",
            _sq_dist("sv", "c").alias("d"),
        )
    )
    contrib = (
        codes.select(
            F.col("vid").alias("neighbor_id"),
            F.posexplode("codes").alias("sub_idx", "cell"),
        )
        .join(F.broadcast(dist_table), ["sub_idx", "cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = contrib.groupBy("query_id", "neighbor_id").agg(
        # value-sorted sequential fold: bit-identical at any partitioning
        # (m is small, so the collect_list is m doubles per pair)
        F.expr(
            "aggregate(array_sort(collect_list(d)), CAST(0.0 AS DOUBLE), "
            "(a, x) -> a + x)"
        ).alias("d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            round4_col(F.lit(1.0) - F.col("d2") / 2.0).alias("cosine_approx"),
        )
    )


# --------------------------------------------------------------- IVF x PQ ---
# The composed at-scale index (IVFADC layout, Jégou et al. TPAMI 2011 §IV,
# without residual encoding): the coarse quantizer ROUTES — each query scans
# only its n_probe nearest cells — and per-cell PQ codes SCORE via the
# broadcast ADC table, so the probe reads m-byte codes from the probed cell
# partitions and never touches corpus float vectors. At 10^12 embeddings
# this is the index that is both RAM-fit (PQ compression) and
# scan-bounded (IVF pruning); plain IVF re-reads float vectors per probe,
# plain PQ scans every code for every query.


def _ivfpq_build(
    embeddings: DataFrame,
    dim: int,
    n_cells: int,
    m: int,
    pq_k: int,
    id_col: str,
    vec_col: str,
    train_iters: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the composed index ONCE: (centroids, codebooks,
    codes-with-ccell). Shared by ivfpq_write_index and ann_ivfpq_topk's
    in-memory branch — the recipe must stay identical or the
    persisted-equals-in-memory contract breaks. Training shares ONE
    normalized-subvector scan (localCheckpoint) between pq_train and
    pq_encode — the pq_topk discipline."""
    centroids = ivf_train_centroids(
        embeddings, n_cells, id_col, vec_col, train_iters
    )
    vecs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    assigned = _assign_cells(vecs, centroids).select(
        "vid", F.col("cell").alias("ccell")
    )
    subs = _pq_subvectors(embeddings, dim, m, id_col, vec_col) \
        .localCheckpoint(eager=True)
    codebooks = pq_train(embeddings, dim, m, pq_k, id_col, vec_col,
                         train_iters, subs=subs)
    codes = pq_encode(embeddings, codebooks, dim, m, id_col, vec_col,
                      subs=subs).join(assigned, "vid")
    return centroids, codebooks, codes


def ivfpq_write_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_cells: int = 8,
    m: int = 8,
    pq_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 3,
) -> None:
    """Materialize the composed index:

        path/centroids – coarse k-means centroids (cell, c)
        path/codebooks – per-subspace PQ codebooks (sub_idx, cell, c)
        path/codes     – (vid, codes) parquet PARTITIONED BY ccell (the
                         coarse cell), so a probe's `ccell IN (...)` filter
                         prunes to n_probe/n_cells of the m-byte codes
    """
    centroids, codebooks, codes = _ivfpq_build(
        embeddings, dim, n_cells, m, pq_k, id_col, vec_col, train_iters
    )
    codes.write.mode("overwrite").partitionBy("ccell") \
        .parquet(f"{path}/codes")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")


def ann_ivfpq_topk(
    embeddings: DataFrame,
    query_filter: str,
    dim: int,
    k: int = C.COSINE_TOPK,
    m: int = 8,
    n_cells: int = 8,
    pq_k: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 3,
    index_path: str | None = None,
) -> DataFrame:
    """IVF-routed ADC top-k: (query_id, neighbor_id, rank, cosine_approx).

    Per query: resolve its n_probe nearest coarse cells (tiny broadcast
    queries×centroids job), read ONLY those cells' code partitions, then
    score each candidate by the PQ ADC sum — m lookups into the broadcast
    per-query distance table, folded value-sorted so the ranking is
    partition-order independent given the trained index (the pq_topk
    determinism contract; training itself keeps the ~1-ulp float-avg
    caveat of both trainers). cosine_approx = 1 - d2/2 on normalized
    vectors. A (query, candidate) pair appears under exactly one coarse
    cell, so no dedup step is needed before the fold.

    index_path=None derives everything in-memory (self-contained at test
    scale); with index_path (written by ivfpq_write_index) the probe is
    the at-scale contract: static `ccell IN (...)` partition pruning over
    m-byte codes."""
    spark = embeddings.sparkSession
    if index_path is not None:
        centroids = spark.read.parquet(f"{index_path}/centroids")
        codebooks = spark.read.parquet(f"{index_path}/codebooks")
        probes = _query_probes(
            embeddings, centroids, query_filter, id_col, vec_col, n_probe
        ).localCheckpoint(eager=True)
        probe_cells = sorted(
            {r["cell"] for r in probes.select("cell").distinct().collect()}
        )
        codes = spark.read.parquet(f"{index_path}/codes").filter(
            F.col("ccell").isin(probe_cells)      # partition pruning
        )
    else:
        centroids, codebooks, codes = _ivfpq_build(
            embeddings, dim, n_cells, m, pq_k, id_col, vec_col, train_iters
        )
        probes = _query_probes(
            embeddings, centroids, query_filter, id_col, vec_col, n_probe
        )

    # per-query ADC table: exact subspace distances query -> every codeword
    qsubs = _pq_subvectors(embeddings, dim, m, id_col, vec_col, query_filter)
    dist_table = (
        qsubs.join(F.broadcast(codebooks), "sub_idx")
        .select(
            F.col("vid").alias("query_id"), "sub_idx", "cell",
            _sq_dist("sv", "c").alias("d"),
        )
    )
    # candidates: codes in cells probed BY THAT query (per-query routing —
    # the join key is the coarse cell, the broadcast side <= queries*n_probe)
    pairs = (
        codes.join(
            F.broadcast(
                probes.select("query_id", F.col("cell").alias("ccell"))
            ),
            "ccell",
        )
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("neighbor_id"), "codes")
    )
    contrib = pairs.select(
        "query_id", "neighbor_id",
        F.posexplode("codes").alias("sub_idx", "cell"),
    ).join(F.broadcast(dist_table), ["query_id", "sub_idx", "cell"])
    scored = contrib.groupBy("query_id", "neighbor_id").agg(
        F.expr(
            "aggregate(array_sort(collect_list(d)), CAST(0.0 AS DOUBLE), "
            "(a, x) -> a + x)"
        ).alias("d2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            round4_col(F.lit(1.0) - F.col("d2") / 2.0).alias("cosine_approx"),
        )
    )
