"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB design requires:
- ``cosine_topk`` — brute-force exact scan. One pass over the corpus,
  TakeOrderedAndProject top-k (per-partition heaps). Correctness
  baseline and perfectly adequate when the query side is small.
- ``ann_lsh_bucketed`` — random-hyperplane LSH: docs hash to sign
  buckets; search only probes the query's bucket. Sub-linear probe
  cost; hyperplanes are derived from md5 so signatures are
  deterministic and engine-portable (no RNG state to ship).

All vector math is JVM higher-order functions (zip_with/aggregate) in
double precision — no Python, no UDF, codegen-friendly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..sources.readers import read_parquet_pinned as _rpp

LSH_PLANES = 8


def _to_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine to the embedding of ``query_vec_id``.
    The single query row broadcasts; the corpus is scanned once."""
    q = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select(_to_double(F.col("embedding")).alias("q_emb"))
    )
    corpus = embeddings.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("emb")
    )
    return (
        corpus.join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplane_sign(emb, plane: int) -> Column:
    """Sign of <emb, h_plane> where h_plane has deterministic ±1
    components: component d is +1 iff the first hex digit of
    md5('p{plane}d{d}') is >= 8. No RNG, no broadcast of plane
    matrices — each executor recomputes the tiny constant expression."""
    signed = F.zip_with(
        emb,
        F.transform(
            F.sequence(F.lit(0), F.size(emb) - 1),
            lambda d: F.when(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"p{plane}d"), d.cast("string"))), 1, 1
                    ),
                    16,
                    10,
                ).cast("int")
                >= 8,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ),
        lambda x, s: x * s,
    )
    return (F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x) >= 0).cast("int")


def lsh_bucket(emb, planes: int = LSH_PLANES) -> Column:
    """Bucket id = concatenated sign bits of `planes` hyperplanes."""
    return F.concat_ws(
        "", *[_hyperplane_sign(emb, p).cast("string") for p in range(planes)]
    )


def ann_lsh_bucketed(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then
    exact cosine within it. At scale the bucketed corpus would be
    written pre-partitioned by bucket (partition pruning turns the
    probe into a single-partition read)."""
    with_bucket = embeddings.select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("emb")
    ).withColumn("bucket", lsh_bucket(F.col("emb"), planes))
    q = (
        with_bucket.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("emb").alias("q_emb"), F.col("bucket").alias("q_bucket"))
    )
    return (
        with_bucket.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def centroid_arrays(embeddings: DataFrame) -> DataFrame:
    """label → centroid array<double> (ordered by dim). The collect
    per label is over `dim` rows only — tiny at any corpus size."""
    dim_rows = embeddings.select(
        "label", F.posexplode(_to_double(F.col("embedding"))).alias("dim", "v")
    )
    return (
        dim_rows.groupBy("label", "dim")
        .agg(F.avg("v").alias("mean_v"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_v"))),
                lambda s: s["mean_v"],
            ).alias("centroid")
        )
    )


def ann_ivf_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid (cell), then search only the query's cell.

    The centroid table is tiny → broadcast; cell assignment is one
    scan. At scale the corpus is written partitioned by cell so a
    query reads one partition (n_probe partitions for higher recall).
    """
    cents = centroid_arrays(embeddings)
    corpus = embeddings.select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("emb")
    )
    # assign each vector to its max-cosine centroid
    assigned = (
        corpus.join(F.broadcast(cents.withColumnRenamed("label", "cell")))
        .withColumn("cent_cos", cosine(F.col("emb"), F.col("centroid")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("cent_cos"), F.asc("cell")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "emb", "cell")
    )
    q = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("q_emb"), F.col("cell").alias("q_cell")
    )
    return (
        assigned.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("cell") == F.col("q_cell"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_vectorized(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Arrow-vectorized Pandas-UDF cosine — the alternative hot path
    when the per-row JVM higher-order functions become the bottleneck
    (numpy does the whole batch as one matrix-vector product). Same
    results as cosine_topk modulo the query-vector source."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf(DoubleType())
    def cos(batch: pd.Series) -> pd.Series:
        m = np.stack(batch.to_numpy())  # (rows, dim) float64
        m = m.astype(np.float64)
        sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(np.round(sims, 6))

    return (
        embeddings.select("vec_id", "label", cos(F.col("embedding")).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _sq_euclid(a, b) -> Column:
    """Σ(aᵢ-bᵢ)² via zip_with + aggregate — JVM higher-order fns,
    left-fold in array order (portable accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    return_centroids: bool = False,
):
    """Distributed Lloyd's k-means over the embedding corpus —
    the classic scalable shape: the k centroids are always a tiny
    broadcast table, each iteration is one narrow scan (k candidate
    distances per vector → keyed argmin) plus one (cluster, dim)
    shuffle to re-average; the corpus is never self-joined and never
    collected.

    Engine-portable determinism: init centroids are the k lowest
    vec_ids' embeddings; every distance and every recomputed centroid
    coordinate is rounded to 6 dp before use, and argmin ties break
    on cluster id — so the assignment trajectory is identical in any
    IEEE engine (the DuckDB oracle replays the same two iterations).
    Returns (vec_id, cluster, dist) after `iterations` assignments.
    """
    corpus = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    w_init = Window.orderBy("vec_id")
    centroids = (
        corpus.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).cast("long").alias("cid"),
            F.col("emb").alias("c"),
        )
    )
    assigned = None
    cents_used = centroids
    for _ in range(iterations):
        cents_used = centroids
        dist = F.round(F.sqrt(_sq_euclid(F.col("emb"), F.col("c"))), 6)
        assigned = (
            corpus.crossJoin(F.broadcast(centroids))
            .select("vec_id", "emb", "cid", dist.alias("dist"))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("dist", "cid")).alias("m"),
                F.first("emb").alias("emb"),
            )
            .select("vec_id", "emb", F.col("m.cid").alias("cid"),
                    F.col("m.dist").alias("dist"))
        )
        centroids = (
            assigned.select("cid", F.posexplode("emb").alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("v"), 6).alias("mv"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                    lambda s: s["mv"],
                ).alias("c")
            )
        )
    out = assigned.select(
        "vec_id", F.col("cid").alias("cluster"), "dist"
    ).orderBy("vec_id")
    if return_centroids:
        return out, cents_used
    return out


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label mean embedding (the IVF coarse-quantizer build step):
    element-wise array average via posexplode → groupBy. Shuffles
    (label, dim) pairs — scales with corpus × dim, not corpus²."""
    dim_rows = embeddings.select(
        "label", F.posexplode(_to_double(F.col("embedding"))).alias("dim", "v")
    )
    return dim_rows.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 6).alias("mean_v")
    )


def quantize_embeddings(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """Scalar (per-vector min/max) int8 quantization — the memory
    lever that makes billion-vector ANN serving fit: 64 float32 dims
    become 64 uint8 codes + 2 float params (~4x smaller, and a SIMD-
    friendly layout for distance kernels). Everything is JVM-side
    array HOFs (transform/zip_with/aggregate) over a narrow scan — no
    shuffle, no Python, linear in corpus x dim.

    Output is an engine-portable per-vector summary rather than the
    raw code array: the integer code checksum pins the exact code
    assignment (floor(x + 0.5) midpoint rule — identical in both
    engines, unlike round()), and the 8-dp-floored reconstruction MSE
    pins the dequantization error. Flat vectors (max == min) quantize
    to all-zero codes with zero error.
    """
    levels = float((1 << bits) - 1)
    v = _to_double(F.col("embedding"))
    base = embeddings.select("vec_id", v.alias("v"))
    mn, mx = F.array_min("v"), F.array_max("v")
    framed = base.select(
        "vec_id",
        "v",
        mn.alias("mn"),
        mx.alias("mx"),
        (mx - mn).alias("s"),
        F.size("v").cast("long").alias("n_dims"),
    )

    def _code(x):
        return (
            F.when(
                F.col("s") > 0,
                F.floor((x - F.col("mn")) / F.col("s") * levels + 0.5).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )

    coded = framed.select(
        "vec_id", "v", "mn", "mx", "s", "n_dims",
        F.transform("v", _code).alias("codes"),
    )
    sq_err = F.zip_with(
        "v",
        "codes",
        lambda x, c: F.pow(x - (F.col("mn") + c / levels * F.col("s")), F.lit(2.0)),
    )
    sse = F.aggregate(sq_err, F.lit(0.0), lambda acc, x: acc + x)
    return coded.select(
        "vec_id",
        "n_dims",
        F.col("mn").alias("vmin"),
        F.col("mx").alias("vmax"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("code_sum"),
        (F.floor(sse / F.col("n_dims") * 1e8 + 0.5).cast("long") / 1e8).alias("mse"),
    )


def cosine_topk_batch(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Batched exact top-k — the realistic serving shape: the first
    ``n_queries`` vectors (by vec_id) form the query set and ONE
    corpus scan serves all of them. The query matrix broadcasts
    (tiny by construction); ranking is row_number over per-query
    partitions, which Spark executes with WindowGroupLimit — a
    map-side size-k heap per partition, so only ~(partitions x
    n_queries x k) rows reach the final shuffle, never the corpus x
    query cross product (plan contract in tests/test_plans.py)."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _to_double(F.col("embedding")).alias("q_emb"),
    )
    corpus = embeddings.select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("emb")
    )
    scored = corpus.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        "label",
        F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "label", "cosine")
    )


def quantized_recall(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10, bits: int = 8
) -> DataFrame:
    """Quantization-quality eval: recall@k of the int8-reconstructed
    cosine ranking against the exact ranking, per query — the
    measurement that decides whether quantize_embeddings' 4x memory
    saving is safe to serve. Same midpoint code rule as
    quantize_embeddings (floor(x + 0.5)), so the reconstruction is
    engine-portable and the recall is a deterministic value, not a
    statistic.

    Scale shape: two corpus scans (exact + reconstructed), each
    ranked via WindowGroupLimit map-side heaps like cosine_topk_batch;
    the final recall join moves only n_queries x k rows.
    """
    levels = float((1 << bits) - 1)
    v = _to_double(F.col("embedding"))
    base = embeddings.select("vec_id", v.alias("v"))
    mn, s = F.array_min("v"), F.array_max("v") - F.array_min("v")
    recon_el = (
        lambda x: F.col("mn")
        + F.when(
            F.col("s") > 0,
            F.floor((x - F.col("mn")) / F.col("s") * levels + 0.5).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        / levels
        * F.col("s")
    )
    recon = base.select(
        "vec_id", "v", mn.alias("mn"), s.alias("s")
    ).select("vec_id", F.transform("v", recon_el).alias("v"))

    def topk(corpus: DataFrame) -> DataFrame:
        q = corpus.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        scored = corpus.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id")
        )

    exact, quant = topk(base), topk(recon)
    hits = exact.join(quant, ["query_id", "vec_id"], "left_semi")
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("nk"))
        .join(hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("nh")), "query_id", "left")
        .select(
            "query_id",
            (
                F.floor(
                    F.coalesce(F.col("nh"), F.lit(0)) / F.col("nk") * 10000 + 0.5
                ).cast("long")
                / 10000.0
            ).alias("recall_at_k"),
        )
    )


def embedding_norm_outliers(embeddings: DataFrame, z_cut: float = 3.0) -> DataFrame:
    """Embedding-space data quality: per-vector L2 norm z-scored
    against the corpus distribution — degenerate vectors (zeroed,
    clipped, double-scaled) show up as norm outliers long before any
    downstream eval does. Narrow scan + one tiny global aggregate
    broadcast back; no shuffle of the corpus. The z-score is floored
    to 4dp BEFORE the cut comparison so the flag is engine-portable
    (both sides compare the identical rounded value)."""
    v = _to_double(F.col("embedding"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    norms = embeddings.select("vec_id", nrm.alias("nrm"))
    stats = norms.agg(
        F.avg("nrm").alias("mu"), F.stddev_pop("nrm").alias("sg")
    )

    def f4(c):
        return F.floor(c * 10000 + 0.5).cast("long") / 10000.0

    z = f4(F.abs(F.col("nrm") - F.col("mu")) / F.col("sg"))
    return norms.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        f4(F.col("nrm")).alias("norm"),
        z.alias("z"),
        (z > z_cut).alias("is_outlier"),
    )


def semantic_dupes(
    embeddings: DataFrame, k: int = 8, threshold: float = 0.45
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding
    corpus (deterministic k-means, 2 rounded Lloyd iterations), then
    find cosine-near pairs ONLY within each cluster — the scalable
    middle tier between exact O(n²) `embedding_near_dupes` and pure
    ANN recall tiers.

    Scale shape: the self-join is keyed on the cluster id, so pair
    work is sum over cells of |cell|² — with k sized ~sqrt(n) (or a
    hierarchical coarse quantizer at 100 TB) cells stay bounded and
    the all-pairs explosion never happens. Centroids remain a tiny
    broadcast; assignment is one narrow scan per Lloyd round.
    Pairs that land in different cells are missed by design — the
    recall/cost dial (raise by multi-probe assignment), same contract
    as the published SemDeDup recipe.
    """
    assigned = kmeans_assign(embeddings, k=k, iterations=2).select(
        "vec_id", "cluster"
    )
    emb = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    # persist before the self-join: a self-join shares no subplan, so
    # without the boundary BOTH sides re-run the full Lloyd
    # assignment (measured 8.8 s → 2.3 s at sf0.1; the cached
    # relation is rows × (id, cluster, vector))
    tagged = assigned.join(emb, "vec_id").persist()
    a, b = tagged.alias("a"), tagged.alias("b")
    cos = F.round(cosine(F.col("a.e"), F.col("b.e")), 6)
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cluster").alias("cluster"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def filtered_cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Metadata-filtered vector search: exact top-k by cosine among
    rows sharing the query vector's OWN label — the filtered-ANN
    pattern (attribute predicate first, distance math only on the
    survivors). At 100 TB the label predicate prunes the scan (or the
    label-partitioned layout) BEFORE any arithmetic; here the filter
    lands in the scan node and the candidate set shrinks ~|labels|-
    fold. Head is TakeOrderedAndProject.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        _to_double(F.col("embedding")).alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    return (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .filter(F.col("label") == F.col("q_label"))
        .select(
            "vec_id",
            "label",
            F.round(
                cosine(_to_double(F.col("embedding")), F.col("q_emb")), 6
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def rrf_fuse(
    lex: DataFrame, sem: DataFrame, k_const: int = 60, top_k: int = 10
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic ranked list
    (Cormack et al. 2009): score(d) = Σ 1/(k + rank_i(d)) over the
    lists that retrieved d. The standard hybrid-retrieval combiner —
    BM25 and embedding ANN disagree on different failure modes, and
    RRF needs no score calibration between them, only ranks.

    Inputs are the two candidate lists, each with a ``doc_id`` and a
    dense 1-based ``rank`` column (missing docs simply contribute 0).
    Per-list contributions are floor-quantized to integer micro-units
    and summed as longs, so fusion is addition-order-free and
    engine-portable; ties break on doc_id.

    Scale shape: both inputs are already top-k lists (bounded by
    construction — TakeOrderedAndProject upstream), so the fusion is
    a tiny full-outer join + head regardless of corpus size. The
    expensive parts (BM25 scan, ANN probe) stay in their own
    bounded-output operators.
    """
    contrib = lambda r: F.floor(1000000.0 / (k_const + r) + 0.5).cast("long")  # noqa: E731
    l = lex.select("doc_id", contrib(F.col("rank")).alias("c_lex"), F.col("rank").alias("lex_rank"))
    s = sem.select("doc_id", contrib(F.col("rank")).alias("c_sem"), F.col("rank").alias("sem_rank"))
    fused = l.join(s, "doc_id", "full_outer").select(
        "doc_id",
        (F.coalesce(F.col("c_lex"), F.lit(0)) + F.coalesce(F.col("c_sem"), F.lit(0))).alias("rrf_micro"),
        "lex_rank",
        "sem_rank",
    )
    return (
        fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
        .limit(top_k)
        .select(
            "doc_id",
            (F.col("rrf_micro") / 1000000.0).alias("rrf_score"),
            "lex_rank",
            "sem_rank",
        )
    )


def centroid_shift(embeddings: DataFrame) -> DataFrame:
    """Embedding drift monitor: per-label centroid L2 shift between
    the two halves of a deterministic md5 split of the corpus — the
    eval that detects when a new ingest batch moved a class's
    embedding distribution (retrain / re-index trigger). A real
    deployment compares snapshot t vs t−1; the content-independent
    hash split here exercises the identical plan on one table.

    Scale shape: posexplode fans each vector to (label, dim) terms —
    64× the row count but tiny rows; ONE uniform shuffle on
    (label, dim, half) with mergeable avg partials; the per-label
    distance rollup is |labels|·dims rows. Shift is computed on
    4-dp-floored per-dimension centroid deltas so the result is
    engine-portable. No Python, no sort, no driver collect.
    """
    half = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 2
    ).alias("half")
    per_dim = (
        embeddings.select(
            "label", half, F.posexplode(F.col("embedding")).alias("dim", "x")
        )
        .groupBy("label", "half", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )
    a = per_dim.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c_a")
    )
    b = per_dim.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("c_b")
    )
    # integer 1e-4-unit deltas: the squared-sum is exact long math
    # (order-free), and IEEE sqrt of the same integer is bit-identical
    # on any engine — no accumulation drift in the distance rollup
    d_int = F.floor((F.col("c_a") - F.col("c_b")) * 10000 + 0.5).cast("long")
    return (
        a.join(b, ["label", "dim"])
        .select("label", d_int.alias("d"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            (
                F.floor(F.sqrt(F.sum(F.col("d") * F.col("d"))) + 0.5).cast(
                    "long"
                )
                / 10000.0
            ).alias("l2_shift"),
        )
        .orderBy("label")
    )


def ann_lsh_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact scan, per
    probe query — the measurement that decides how many hyperplanes
    (bucket granularity) a corpus can afford before recall drops: the
    index-tuning eval next to quantized_recall's storage eval.

    Probes are the first `n_queries` vec_ids (deterministic, no RNG).
    Scale shape: signatures are computed once per corpus row (pure
    JVM map); the probe set broadcasts into both arms; the exact arm
    ranks per query with a WindowGroupLimit-prunable row_number; the
    LSH arm only ranks within matching buckets. Ranking uses the
    6-dp-rounded cosine with vec_id tiebreaks so the top-k boundary
    is engine-portable; recall is floor-quantized at 4 dp.
    """
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    with_bucket = base.withColumn("bucket", lsh_bucket(F.col("emb"), planes))
    queries = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = F.round(cosine(F.col("emb"), F.col("q_emb")), 6)
    rn = F.row_number().over(
        Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    )
    exact_k = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )
    lsh_k = (
        with_bucket.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .select("q_id", F.col("vec_id").alias("l_vec_id"))
    )
    ex_n = exact_k.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    ls_n = lsh_k.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_lsh"))
    ov_n = (
        exact_k.join(
            lsh_k,
            (exact_k["q_id"] == lsh_k["q_id"])
            & (exact_k["vec_id"] == lsh_k["l_vec_id"]),
        )
        .groupBy(exact_k["q_id"].alias("q_id"))
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        ex_n.join(ls_n, "q_id", "left")
        .join(ov_n, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce(F.col("n_lsh"), F.lit(0)).alias("n_lsh"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (
                F.floor(
                    F.coalesce(F.col("n_overlap"), F.lit(0))
                    / F.col("n_exact")
                    * 10000
                    + 0.5
                ).cast("long")
                / 10000.0
            ).alias("recall"),
        )
        .orderBy("q_id")
    )


def top_component_power(
    embeddings: DataFrame, iters: int = 3, dims_out: int = 8
) -> DataFrame:
    """First principal direction of the embedding Gram matrix by
    distributed power iteration: x ← normalize(Σ_rows v·(v·x)),
    starting from the exact-representable uniform unit vector
    (1/8 per dim at d=64). Three fixed iterations — the iterative
    linear-algebra pattern (eigenvector centrality, PCA whitening,
    spectral hashing) executed as a lazy chain of Spark aggregates:
    per iteration ONE row-wise dot (broadcast x), one micro-quantized
    per-dimension sum (a 64-key shuffle with partials), and a
    JVM-fold normalization — no driver loop, no collect, no Python.

    Determinism: per-row contributions floor-quantize to integer
    micro-units before the dimension sum (addition-order-free); the
    64-term norm fold runs over the dimension-sorted array
    (sequential, engine-portable). Returns the first `dims_out`
    loadings plus the eigenvalue estimate ‖y‖ of the final iterate.
    """
    spark = embeddings.sparkSession
    emb = embeddings.select(_to_double(F.col("embedding")).alias("v"))
    n_dim = 64
    x_df = spark.range(1).select(
        F.array(*[F.lit(0.125)] * n_dim).alias("x")
    )
    norm_expr = """
        sqrt(aggregate(
          ys, cast(0.0 as double),
          (acc, s) -> acc + (s.yq / 1000000.0) * (s.yq / 1000000.0)))
    """
    for _ in range(iters):
        dotted = emb.crossJoin(F.broadcast(x_df)).select(
            "v", _dot(F.col("v"), F.col("x")).alias("d")
        )
        contrib = dotted.select(
            F.posexplode("v").alias("j", "vj"), F.col("d")
        ).select(
            "j",
            F.floor(F.col("vj") * F.col("d") * 1000000).cast("long").alias("c"),
        )
        y = contrib.groupBy("j").agg(F.sum("c").alias("yq"))
        packed = y.agg(
            F.sort_array(F.collect_list(F.struct("j", "yq"))).alias("ys")
        )
        x_df = packed.select(
            F.expr(
                f"""
                transform(ys, s -> cast(floor(s.yq / ({norm_expr}) + 0.5)
                                        as bigint) / cast(1000000 as double))
                """
            ).alias("x"),
            F.expr(
                f"cast(floor(({norm_expr}) * 100 + 0.5) as bigint) / cast(100 as double)"
            ).alias("eigen_est"),
        )
    return (
        x_df.select(F.posexplode("x").alias("dim", "loading"), "eigen_est")
        .filter(F.col("dim") < dims_out)
        .select("dim", "loading", "eigen_est")
        .orderBy("dim")
    )


def ann_multiprobe_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Multi-probe LSH eval: recall@k when each query probes its own
    bucket PLUS the `planes` buckets at Hamming distance 1 (one sign
    bit flipped) — the classic recall/cost dial that buys back the
    vectors a single hyperplane miscut, without adding tables. Probes
    are materialized as an exploded (query, probe_bucket) list so the
    candidate fetch stays an EQUI-join on the bucket key (per-probe
    partition reads at scale), never a theta-join bucket comparison.

    Output per query: single-probe and multi-probe recall plus both
    candidate counts — the before/after a tuning decision reads.
    """
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    with_bucket = base.withColumn("bucket", lsh_bucket(F.col("emb"), planes))
    flips = [F.col("q_bucket")] + [
        F.concat(
            F.substring(F.col("q_bucket"), 1, i),
            F.when(
                F.substring(F.col("q_bucket"), i + 1, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1")),
            F.substring(F.col("q_bucket"), i + 2, planes - i - 1),
        )
        for i in range(planes)
    ]
    queries = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    probes = queries.select(
        "q_id", "q_emb", "q_bucket", F.explode(F.array(*flips)).alias("pb")
    )
    cos = F.round(cosine(F.col("emb"), F.col("q_emb")), 6)
    rn = F.row_number().over(
        Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    )

    def topk(cand):
        return cand.withColumn("rn", rn).filter(F.col("rn") <= k)

    exact_k = topk(
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id")).select(
            "q_id", "vec_id", cos.alias("cosine")
        )
    ).select("q_id", "vec_id")
    single_cand = (
        with_bucket.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id", cos.alias("cosine"))
    )
    multi_cand = (
        with_bucket.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("pb"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id", cos.alias("cosine"))
        .groupBy("q_id", "vec_id")
        .agg(F.max("cosine").alias("cosine"))
    )

    def recall_of(cand, tag):
        ck = topk(cand).select("q_id", F.col("vec_id").alias("c_vec"))
        n_c = cand.groupBy("q_id").agg(
            F.count(F.lit(1)).alias(f"n_cand_{tag}")
        )
        ov = (
            exact_k.join(
                ck,
                (exact_k["q_id"] == ck["q_id"])
                & (exact_k["vec_id"] == ck["c_vec"]),
            )
            .groupBy(exact_k["q_id"].alias("q_id"))
            .agg(F.count(F.lit(1)).alias(f"ov_{tag}"))
        )
        return n_c, ov

    ex_n = exact_k.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    sc_n, sc_ov = recall_of(single_cand, "single")
    mc_n, mc_ov = recall_of(multi_cand, "multi")
    rec = lambda tag: (  # noqa: E731
        F.floor(
            F.coalesce(F.col(f"ov_{tag}"), F.lit(0)) / F.col("n_exact") * 10000
            + 0.5
        ).cast("long")
        / 10000.0
    )
    return (
        ex_n.join(sc_n, "q_id", "left")
        .join(sc_ov, "q_id", "left")
        .join(mc_n, "q_id", "left")
        .join(mc_ov, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce(F.col("n_cand_single"), F.lit(0)).alias("n_cand_single"),
            rec("single").alias("recall_single"),
            F.coalesce(F.col("n_cand_multi"), F.lit(0)).alias("n_cand_multi"),
            rec("multi").alias("recall_multi"),
        )
        .orderBy("q_id")
    )


def contrastive_negatives(
    embeddings: DataFrame, pool_size: int = 32, k: int = 4
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor gets `k` pseudo-random negatives with a DIFFERENT label,
    drawn from a fixed md5-ranked pool and ranked per anchor by
    md5(anchor|candidate) — fully reproducible, no RNG state.

    Scale shape: the pool is a TakeOrderedAndProject head of
    `pool_size` rows, broadcast; the anchor × pool fan-out is bounded
    at pool_size per anchor (never corpus × corpus). Per-anchor
    ranking is an aggregate — sort_array over a ≤pool_size collected
    list, sliced to k — so there is exactly one uniform shuffle on
    the anchor key and no window sort. Negatives are label-aware
    (anti-label filter); for in-batch hard negatives swap the md5
    rank key for an ANN distance from ann_lsh_topk.
    """
    pool = (
        embeddings.select(
            F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
        )
        .orderBy(F.md5(F.col("neg_id").cast("string")), F.asc("neg_id"))
        .limit(pool_size)
    )
    h = F.md5(
        F.concat_ws(
            "|", F.col("vec_id").cast("string"), F.col("neg_id").cast("string")
        )
    )
    cand = (
        embeddings.select("vec_id", "label")
        .crossJoin(F.broadcast(pool))
        .filter(F.col("neg_label") != F.col("label"))
        .select("vec_id", "neg_id", h.alias("h"))
    )
    picked = cand.groupBy("vec_id").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("h", "neg_id"))), 1, k
        ).alias("top")
    )
    pos = F.posexplode(F.col("top"))
    return (
        picked.select("vec_id", pos)
        .select(
            "vec_id",
            F.col("col.neg_id").alias("neg_id"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
        .orderBy("vec_id", "rank")
    )


def matryoshka_recall(
    embeddings: DataFrame,
    dims: tuple[int, ...] = (16, 32),
    n_queries: int = 8,
    k: int = 10,
) -> DataFrame:
    """Matryoshka-truncation eval: recall@k of cosine rankings using
    only the first `d` embedding dimensions against the full-dim exact
    ranking — the measurement behind 'can we serve the 16-dim prefix
    and cut the ANN index 4x'. Recall is pooled as Σhits/Σpossible
    (integer sums, one division) so the number is engine-portable.

    Scale shape: same WindowGroupLimit map-side-heap ranking as
    cosine_topk_batch, once per tier; queries broadcast; the recall
    join moves only n_queries × k rows per tier. Tiers are
    independent — on a cluster they pipeline.
    """
    base = embeddings.select("vec_id", _to_double(F.col("embedding")).alias("v"))

    def topk(corpus: DataFrame) -> DataFrame:
        q = corpus.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        scored = corpus.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("vec_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "vec_id")
        )

    exact = topk(base)
    tiers = []
    for d in dims:
        trunc = base.select("vec_id", F.slice("v", 1, d).alias("v"))
        hits = exact.join(topk(trunc), ["query_id", "vec_id"], "left_semi")
        tiers.append(
            exact.agg(F.count(F.lit(1)).alias("nk"))
            .crossJoin(
                F.broadcast(hits.agg(F.count(F.lit(1)).alias("nh")))
            )
            .select(
                F.lit(d).alias("dim"),
                (
                    F.floor(F.col("nh") / F.col("nk") * 10000 + 0.5).cast(
                        "long"
                    )
                    / 10000.0
                ).alias("recall_at_k"),
            )
        )
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionAll(t)
    return out.orderBy("dim")


def ann_ndcg_eval(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Ranking-quality eval with graded position discounts: nDCG@k of
    the exact cosine ranking, using label agreement as the relevance
    judgment (candidate relevant iff it shares the query's label) —
    the IR-standard complement to the recall@k evals, sensitive to
    WHERE in the top-k the relevant items land.

    Scale shape: identical WindowGroupLimit ranking as
    cosine_topk_batch (queries broadcast, map-side heaps); the ideal
    DCG comes from per-label counts (a tiny broadcast), so no second
    ranking pass. All discount sums are over k rows per query.
    """
    base = embeddings.select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("v")
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    scored = base.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "q_label",
        "vec_id",
        "label",
        F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    dcg = topk.groupBy("query_id", "q_label").agg(
        F.sum(
            F.when(F.col("label") == F.col("q_label"), 1.0).otherwise(0.0)
            / F.log2(F.col("rn") + 1)
        ).alias("dcg")
    )
    # ideal: all relevant items first; m = same-label candidates
    label_counts = base.groupBy("label").agg(F.count(F.lit(1)).alias("n_l"))
    ideal = (
        q.join(
            F.broadcast(label_counts),
            q.q_label == label_counts.label,
        )
        # the query itself is excluded from its candidate pool
        .select("query_id", (F.col("n_l") - 1).alias("m"))
        .select(
            "query_id",
            F.aggregate(
                F.sequence(
                    F.lit(1), F.least(F.col("m"), F.lit(k)).cast("int")
                ),
                F.lit(0.0),
                lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
            ).alias("idcg"),
        )
    )
    return (
        dcg.join(ideal, "query_id")
        .select(
            "query_id",
            (F.floor(F.col("dcg") * 10000 + 0.5).cast("long") / 10000.0).alias(
                "dcg"
            ),
            (
                F.floor(
                    F.when(
                        F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
                    ).otherwise(0.0)
                    * 10000
                    + 0.5
                ).cast("long")
                / 10000.0
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


# PQ defaults — interpolated into the registry SQL oracles.
PQ_SUBSPACES = 4
PQ_CODEBOOK_K = 8
EMB_DIM = 64
IVFPQ_QUERY = 0
IVFPQ_K = 10
IVFPQ_NPROBE = 2
IVFPQ_SHORTLIST = 30


def _subvector_structs(vec_col: str, n_subspaces: int, sub_d: int):
    return [
        F.struct(
            F.lit(s).cast("long").alias("sub_id"),
            F.slice(F.col(vec_col), s * sub_d + 1, sub_d).alias("sv"),
        )
        for s in range(n_subspaces)
    ]


def pq_codebooks(
    embeddings: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Deterministic per-subspace PQ codebooks (code, sub_id, cv):
    the codebook_k lowest vec_ids' subvectors — same init device as
    kmeans_assign, shared by the report and the IVF-PQ search."""
    sub_d = dim // n_subspaces
    corpus = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    w_init = Window.orderBy("vec_id")
    cb = (
        corpus.orderBy("vec_id")
        .limit(codebook_k)
        .select(
            (F.row_number().over(w_init) - 1).cast("long").alias("code"),
            "e",
        )
    )
    return cb.select(
        "code", F.explode(F.array(*_subvector_structs("e", n_subspaces, sub_d))).alias("x")
    ).select("code", "x.sub_id", F.col("x.sv").alias("cv"))


def pq_codes(
    embeddings: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Per-vector PQ code assignment (vec_id, sub_id, code, dist):
    broadcast codebooks into one narrow scan, 6-dp rounded distances,
    argmin ties on code id."""
    sub_d = dim // n_subspaces
    corpus = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    subs = corpus.select(
        "vec_id",
        F.explode(F.array(*_subvector_structs("e", n_subspaces, sub_d))).alias("x"),
    ).select("vec_id", "x.sub_id", "x.sv")
    cb_subs = pq_codebooks(embeddings, n_subspaces, codebook_k, dim)
    dist = F.round(F.sqrt(_sq_euclid(F.col("sv"), F.col("cv"))), 6)
    return (
        subs.join(F.broadcast(cb_subs), "sub_id")
        .select("vec_id", "sub_id", "code", dist.alias("dist"))
        .groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("dist", "code")).alias("m"))
        .select(
            "vec_id",
            "sub_id",
            F.col("m.code").alias("code"),
            F.col("m.dist").alias("dist"),
        )
    )



def pq_codebook_report(
    embeddings: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Product-quantization (PQ) compression audit — the memory tier
    beyond int8 scalar quantization (quantize_embeddings) for a
    100 TB vector corpus: the `dim`-dim vector splits into
    `n_subspaces` contiguous subvectors, each subspace quantizes
    against its own `codebook_k`-entry codebook, and a stored vector
    becomes n_subspaces code ids — dim·4 bytes → n_subspaces·log2(k)
    bits (64-dim float32 = 256 B → 4×3 bits here; 64× smaller at
    k=256 in production). This report is the sizing measurement run
    BEFORE building the index: per-(subspace, code) occupancy (dead /
    hot codes ⇒ re-train), per-cell quantization error, and the
    corpus mean reconstruction error the recall budget must absorb.

    Engine-portable determinism (same device as kmeans_assign): the
    codebook is the `codebook_k` lowest vec_ids' subvectors, every
    distance is 6-dp rounded, argmin ties break on code id — the
    DuckDB oracle replays assignment exactly.

    Scale shape: the codebook is a broadcast (n_subspaces×k rows);
    assignment is ONE narrow scan (per-row explode into subvectors →
    k rounded distances → keyed argmin, all JVM higher-order fns);
    the report is one (subspace, code) groupBy with map-side combine.
    No self-join, no collect, no global sort.
    """
    assigned = pq_codes(embeddings, n_subspaces, codebook_k, dim)
    # mean over exact integer MICROS, never floor(avg(double)): the
    # double partial-aggregate merge order varies with task
    # completion order, and a last-ulp wobble at a .5 knife edge
    # flips the 6th decimal (observed once under concurrent load,
    # round 9). dist is already 6-dp rounded, so the micro recovery
    # is exact and the long sum is order-independent.
    micro = F.floor(F.col("dist") * 1000000 + 0.5).cast("long")
    return (
        assigned.groupBy("sub_id", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (
                F.floor(
                    F.sum(micro) / F.count(F.lit(1)) + 0.5
                ).cast("long")
                / 1000000.0
            ).alias("mean_err"),
            F.max("dist").alias("max_err"),
        )
        .orderBy("sub_id", "code")
    )


def ivf_shard_plan(
    embeddings: DataFrame, n_shards: int = 4, k: int = 8
) -> DataFrame:
    """IVF serving-shard plan: after the coarse quantizer clusters the
    corpus (deterministic k-means, the engine's IVF build step), the
    cells must be packed onto serving shards with BALANCED vector
    counts — a skewed shard becomes the fleet's latency tail. Cells
    rank by occupancy and fold onto shards in a deterministic snake
    (rank 1..2n→shards 0..n-1,n-1..0, repeating): the classic greedy
    bound without iterative state, so it stays one window + one
    projection in any engine. The report gives each shard's cell
    count, vector load, and share — the balance check run before
    rolling the index out.

    Scale shape: inherits kmeans_assign (broadcast centroids, narrow
    scans); everything after runs on the |cells|-row relation. The
    rank window orders k rows, not the corpus.
    """
    assigned = kmeans_assign(embeddings, k=k, iterations=2)
    cells = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    w = Window.orderBy(F.col("n_vectors").desc(), F.col("cluster"))
    ranked = cells.select(
        "cluster", "n_vectors", (F.row_number().over(w) - 1).alias("r")
    )
    pos = F.col("r") % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
    per_shard = (
        ranked.select(shard.cast("long").alias("shard"), "n_vectors")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_vectors").cast("long").alias("n_vectors"),
        )
    )
    wall = Window.partitionBy()
    return per_shard.select(
        "shard",
        "n_cells",
        "n_vectors",
        (
            F.floor(
                F.col("n_vectors")
                / F.sum("n_vectors").over(wall)
                * 1000000
                + 0.5
            ).cast("long")
            / 1000000.0
        ).alias("load_share"),
    ).orderBy("shard")


def ann_ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int = IVFPQ_QUERY,
    k: int = IVFPQ_K,
    n_probe: int = IVFPQ_NPROBE,
    n_cells: int = 8,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
    shortlist: int = IVFPQ_SHORTLIST,
) -> DataFrame:
    """Full FAISS-style IVF-PQ serving pipeline — the 100 TB ANN
    architecture assembled end-to-end from the engine's own tiers:
    (1) coarse quantizer (deterministic k-means cells) prunes the
    corpus to the query's `n_probe` nearest cells; (2) PQ codes +
    an ADC lookup table (per-(subspace, code) distances to the
    query's subvectors — n_subspaces×codebook_k rows, broadcast)
    score every candidate WITHOUT touching its full vector:
    approx_d² = Σ_sub d²(q_sub, codebook[sub, code_v]); (3) the
    `shortlist` best approximate candidates re-rank against their
    exact vectors. Returns the exact-ranked top k with both
    distances — the recall/IO dial (n_probe, shortlist) made
    visible.

    At 100 TB: the corpus stores cells (partition key) + 4-byte PQ
    codes; step 2 reads codes only (≈64× less IO than vectors), step
    3 fetches `shortlist` full vectors. Every relation that crosses
    the plan is a broadcast (centroids, codebooks, ADC table, probe
    cells, query); the only corpus-shaped work is the probed-cell
    scan. The ranking windows run over |candidates-in-probed-cells|
    and |shortlist| rows.

    Determinism: same devices as kmeans_assign / pq_codes (6-dp
    rounded distances, ties on id), so the DuckDB oracle replays the
    full pipeline value-for-value.
    """
    sub_d = dim // n_subspaces
    corpus = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    assigned, cents = kmeans_assign(
        embeddings, k=n_cells, iterations=2, return_centroids=True
    )
    codes = pq_codes(embeddings, n_subspaces, codebook_k, dim)
    cb = pq_codebooks(embeddings, n_subspaces, codebook_k, dim)
    q = corpus.filter(F.col("vec_id") == query_vec_id).select(
        F.col("e").alias("qe")
    )
    qcells = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cid",
            F.round(F.sqrt(_sq_euclid(F.col("c"), F.col("qe"))), 6).alias(
                "qd"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy("qd", "cid")),
        )
        .filter(F.col("rn") <= n_probe)
        .select("cid")
    )
    qsubs = q.select(
        F.explode(
            F.array(*_subvector_structs("qe", n_subspaces, sub_d))
        ).alias("x")
    ).select("x.sub_id", F.col("x.sv").alias("qv"))
    dsub = F.round(F.sqrt(_sq_euclid(F.col("cv"), F.col("qv"))), 6)
    adc = (
        cb.join(F.broadcast(qsubs), "sub_id")
        .select("sub_id", "code", (dsub * dsub).alias("d2sub"))
    )
    cand = (
        assigned.join(
            F.broadcast(qcells), F.col("cluster") == F.col("cid"), "left_semi"
        )
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
    )
    approx = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(adc), ["sub_id", "code"])
        .groupBy("vec_id")
        .agg(
            (
                F.floor(F.sum("d2sub") * 1000000 + 0.5).cast("long")
                / 1000000.0
            ).alias("approx_d2")
        )
    )
    short = approx.withColumn(
        "rn", F.row_number().over(Window.orderBy("approx_d2", "vec_id"))
    ).filter(F.col("rn") <= shortlist)
    exact = (
        short.join(corpus, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "approx_d2",
            F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("qe"))), 6).alias(
                "exact_dist"
            ),
        )
    )
    return (
        exact.withColumn(
            "rank",
            F.row_number().over(Window.orderBy("exact_dist", "vec_id")),
        )
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "approx_d2", "exact_dist")
        .orderBy("rank")
    )


def ann_ivfpq_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_probe: int = IVFPQ_NPROBE,
    n_cells: int = 8,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
    shortlist: int = IVFPQ_SHORTLIST,
) -> DataFrame:
    """Recall@k of the IVF-PQ pipeline against the exact full-corpus
    L2 ranking, per probe query — the measurement that sets n_probe
    and shortlist before the index ships (completes the eval symmetry:
    LSH has ann_lsh_recall, int8 has quantized_recall, IVF-PQ has
    this). Loss decomposes into cell misses (true neighbor in an
    unprobed cell) and ADC misses (quantized distance mis-ranks the
    shortlist) — raise n_probe for the former, shortlist or
    codebook_k for the latter.

    Scale shape: identical tiers to ann_ivfpq_topk, batched over the
    query set: probe cells / ADC tables / queries all broadcast
    (n_queries-bounded); candidate scoring is keyed per (query, cell);
    rankings are per-query windows (WindowGroupLimit map-side heaps).
    The exact-truth scan is the eval's own cost, not the serving
    path's.
    """
    sub_d = dim // n_subspaces
    corpus = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    assigned, cents = kmeans_assign(
        embeddings, k=n_cells, iterations=2, return_centroids=True
    )
    codes = pq_codes(embeddings, n_subspaces, codebook_k, dim)
    cb = pq_codebooks(embeddings, n_subspaces, codebook_k, dim)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    wq = Window.partitionBy("query_id")
    qcells = (
        cents.crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            "cid",
            F.round(F.sqrt(_sq_euclid(F.col("c"), F.col("qe"))), 6).alias(
                "qd"
            ),
        )
        .withColumn("rn", F.row_number().over(wq.orderBy("qd", "cid")))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cid")
    )
    qsubs = queries.select(
        "query_id",
        F.explode(
            F.array(*_subvector_structs("qe", n_subspaces, sub_d))
        ).alias("x"),
    ).select("query_id", "x.sub_id", F.col("x.sv").alias("qv"))
    dsub = F.round(F.sqrt(_sq_euclid(F.col("cv"), F.col("qv"))), 6)
    adc = cb.join(F.broadcast(qsubs), "sub_id").select(
        "query_id", "sub_id", "code", (dsub * dsub).alias("d2sub")
    )
    cand = (
        assigned.join(
            F.broadcast(qcells), F.col("cluster") == F.col("cid")
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    approx = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(adc), ["query_id", "sub_id", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            (
                F.floor(F.sum("d2sub") * 1000000 + 0.5).cast("long")
                / 1000000.0
            ).alias("approx_d2")
        )
    )
    short = approx.withColumn(
        "rn", F.row_number().over(wq.orderBy("approx_d2", "vec_id"))
    ).filter(F.col("rn") <= shortlist)
    served = (
        short.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("qe"))), 6).alias(
                "d"
            ),
        )
        .withColumn("rn", F.row_number().over(wq.orderBy("d", "vec_id")))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )
    truth = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("qe"))), 6).alias(
                "d"
            ),
        )
        .withColumn("rn", F.row_number().over(wq.orderBy("d", "vec_id")))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )
    hits = served.join(truth, ["query_id", "vec_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            (
                F.floor(
                    F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))
                    * 10000
                    + 0.5
                ).cast("long")
                / 10000.0
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ------------------------------------------------------------------
# Maintained IVF-PQ index artifact — build once / add incrementally /
# serve probe-only (VERDICT r4 ask #1).
#
# Lifecycle (the FAISS deployment shape, re-expressed as Spark
# tables):
#   1. TRAIN  — the coarse quantizer (k-means cells) and the PQ
#      codebooks train ONCE, on a deterministic hash-slice sample of
#      the corpus (vec_id % IVFPQ_BATCH_MOD != IVFPQ_BATCH_RESIDUE).
#      After training they are FROZEN — adding data never retrains,
#      exactly like faiss.IndexIVFPQ.add after .train.
#   2. BUILD  — every corpus vector encodes against the frozen
#      quantizers into a 3-table artifact: centroids (n_cells rows),
#      codebooks (n_subspaces x k rows), codes (one row per vector x
#      subspace, PARTITIONED BY cell on disk).
#   3. ADD    — a new ingest batch encodes against the same frozen
#      quantizers and APPENDS to the codes table. Because the
#      trainer never sees the held-out residue slice, incremental
#      add == full rebuild VECTOR FOR VECTOR — the driver oracle for
#      `ann_ivfpq_add_serve` exploits exactly this: Spark serves from
#      base-index + appended batch, DuckDB replays a full rebuild.
#   4. SERVE  — probe-only: pick n_probe cells from the broadcast
#      centroid table (a k-row planner step), read ONLY those cell
#      partitions of the codes table (literal partition pruning on
#      the artifact), ADC-score 4-byte codes, exact re-rank the
#      shortlist against fetched vectors.
#
# At 100 TB: step 2/3 are scheduled pipeline jobs, step 4 is the
# only per-query cost — centroid broadcast + n_probe partition scans
# + |shortlist| vector fetches. The corpus-linear kmeans/PQ passes
# that ann_ivfpq_topk paid per query are gone from the serving path.
# ------------------------------------------------------------------

IVFPQ_BATCH_MOD = 10
IVFPQ_BATCH_RESIDUE = 7  # held-out ingest slice: vec_id % 10 == 7
IVFPQ_N_CELLS = 8
IVFPQ_SERVE_QUERY = 1  # probe query for the maintained-index serve
IVFPQ_ADD_QUERY = 2  # probe query for the post-add serve
IVFPQ_ERASE_MOD = 9  # erase set: vec_id % MOD == RESIDUE (oracle lockstep)
IVFPQ_ERASE_RESIDUE = 4
IVFPQ_ERASE_QUERY = 3  # probe query for the post-erase serve (not erased)


def ivfpq_train(
    embeddings: DataFrame,
    n_cells: int = IVFPQ_N_CELLS,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
):
    """Train the FROZEN quantizer pair (coarse centroids + PQ
    codebooks) on the deterministic train slice
    (vec_id % IVFPQ_BATCH_MOD != IVFPQ_BATCH_RESIDUE). The slice
    filter is applied HERE, unconditionally, so training on the base
    corpus and training on corpus+batch yield byte-identical
    quantizers — the property that makes incremental add equal a
    full rebuild. Returns (centroids(cid, c), codebooks(code,
    sub_id, cv)); both are broadcast-sized."""
    train = embeddings.filter(
        F.col("vec_id") % IVFPQ_BATCH_MOD != IVFPQ_BATCH_RESIDUE
    )
    _, cents = kmeans_assign(
        train, k=n_cells, iterations=2, return_centroids=True
    )
    cb = pq_codebooks(train, n_subspaces, codebook_k, dim)
    return cents, cb


def ivfpq_assign_cells(
    vectors: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Coarse-quantizer assignment against FROZEN centroids: one
    broadcast-centroid narrow scan, rounded-6dp euclidean argmin with
    ties on cid (kmeans_assign's determinism device). Shared by
    ivfpq_encode (build + incremental add) and SemDeDup's cell
    assignment (dedup.semdedup_prune_plan), so the whole curation
    stack lives on ONE maintained cell layout. Returns
    (vec_id, e, cell)."""
    corpus = vectors.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    dist = F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("c"))), 6)
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .select("vec_id", "e", "cid", dist.alias("dist"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"), F.first("e").alias("e"))
        .select("vec_id", "e", F.col("m.cid").alias("cell"))
    )


def ivfpq_encode(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Encode vectors against FROZEN quantizers → index rows
    (vec_id, cell, sub_id, code). One narrow scan: broadcast
    centroids give the cell (rounded-6dp argmin, ties on cid —
    kmeans_assign's device), broadcast codebooks give the per-
    subspace code (same device on code id). Used by both the initial
    build and every incremental add — there is exactly one encoding
    path, so add-vs-rebuild equivalence is structural."""
    sub_d = dim // n_subspaces
    cells = ivfpq_assign_cells(vectors, centroids)
    subs = cells.select(
        "vec_id",
        "cell",
        F.explode(
            F.array(*_subvector_structs("e", n_subspaces, sub_d))
        ).alias("x"),
    ).select("vec_id", "cell", "x.sub_id", "x.sv")
    dsub = F.round(F.sqrt(_sq_euclid(F.col("sv"), F.col("cv"))), 6)
    return (
        subs.join(F.broadcast(codebooks), "sub_id")
        .select("vec_id", "cell", "sub_id", dsub.alias("d"), "code")
        .groupBy("vec_id", "cell", "sub_id")
        .agg(F.min(F.struct("d", "code")).alias("m"))
        .select("vec_id", "cell", "sub_id", F.col("m.code").alias("code"))
    )


def build_ivfpq_index(
    corpus: DataFrame,
    n_cells: int = IVFPQ_N_CELLS,
    n_subspaces: int = PQ_SUBSPACES,
    codebook_k: int = PQ_CODEBOOK_K,
    dim: int = EMB_DIM,
) -> dict:
    """Full index build: train the frozen quantizers, encode the
    corpus. Returns {"centroids", "codebooks", "codes"} DataFrames —
    the 3-table artifact write_ivfpq_index persists."""
    cents, cb = ivfpq_train(corpus, n_cells, n_subspaces, codebook_k, dim)
    codes = ivfpq_encode(corpus, cents, cb, n_subspaces, dim)
    return {"centroids": cents, "codebooks": cb, "codes": codes}


def write_ivfpq_index(index: dict, path: str) -> None:
    """Persist the artifact: centroids + codebooks as single small
    parquet tables, codes PARTITIONED BY cell — the physical layout
    that turns a serve-time cell probe into a partition-pruned read
    (only n_probe of n_cells directories are touched)."""
    index["centroids"].write.mode("overwrite").parquet(f"{path}/centroids")
    index["codebooks"].write.mode("overwrite").parquet(f"{path}/codebooks")
    (
        index["codes"]
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )


def read_ivfpq_index(spark, path: str) -> dict:
    """Load the maintained artifact. The codes' partition column
    comes back via directory inference — cast to long so appended
    in-memory batches union cleanly."""
    return {
        "centroids": _rpp(spark, f"{path}/centroids"),
        "codebooks": _rpp(spark, f"{path}/codebooks"),
        "codes": _rpp(spark, f"{path}/codes").select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            "sub_id",
            "code",
        ),
    }


def read_ivfpq_index_with_adds(spark, path: str) -> dict:
    """Load the maintained artifact INCLUDING un-compacted streaming
    adds: serve-time codes = base codes ∪ every `codes_adds/
    batch_id=N` segment run_ivfpq_add_stream has published (the
    L0-segment shape — a compaction job folds segments into the base
    on its own schedule; probing reads both until then). Cell
    partition pruning applies to base and segments alike: both
    layouts carry cell as a directory partition."""
    import os

    from .dedup import require_local_index_path

    require_local_index_path("read_ivfpq_index_with_adds", path)
    from . import artifact_lifecycle as alc

    alc.recover_torn_compaction(path, "codes")
    index = read_ivfpq_index(spark, path)
    adds_dir = f"{path}/codes_adds"
    if os.path.isdir(adds_dir) and any(
        e.startswith("batch_id=") for e in os.listdir(adds_dir)
    ):
        adds = _rpp(spark, adds_dir).select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            "sub_id",
            "code",
        )
        index["codes"] = index["codes"].unionByName(adds)
    return index


def ivfpq_add_batch(index: dict, batch: DataFrame) -> DataFrame:
    """Incremental add: encode the ingest batch against the FROZEN
    quantizers — no retrain, no rebuild, no touch of existing codes.
    Returns the new index rows (append them to the codes table /
    union them at serve time). Cost is one narrow scan of the batch:
    O(|batch|), independent of corpus size."""
    return ivfpq_encode(batch, index["centroids"], index["codebooks"])


def ann_ivfpq_serve(
    index: dict,
    vectors: DataFrame,
    query_vec_id: int,
    k: int = IVFPQ_K,
    n_probe: int = IVFPQ_NPROBE,
    shortlist: int = IVFPQ_SHORTLIST,
    n_subspaces: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
    extra_codes: DataFrame | None = None,
) -> DataFrame:
    """Probe-only IVF-PQ serve against a maintained index: NO
    training, NO encoding of the corpus — the per-query work is
    (a) a planner step ranking the n_cells-row centroid table against
    the query (collected: n_probe ints, the same bounded-scalar
    device as dedup's block-grid count), (b) a partition-pruned read
    of the probed cells' codes, (c) broadcast-ADC scoring of 4-byte
    codes, (d) exact re-rank of the `shortlist` fetched vectors.
    `vectors` is the vector store used only for the query row and the
    shortlist fetch; `extra_codes` unions an un-compacted incremental
    batch into the probe (the serve-while-adding path).

    Determinism devices identical to ann_ivfpq_topk (6-dp rounds,
    floor-1e6 ADC sums, ties on id) so a DuckDB full-rebuild replay
    matches value-for-value."""
    sub_d = dim // n_subspaces
    codes = index["codes"]
    if extra_codes is not None:
        codes = codes.unionByName(extra_codes)
    q = (
        vectors.filter(F.col("vec_id") == query_vec_id)
        .select(_to_double(F.col("embedding")).alias("qe"))
    )
    # planner step: rank n_cells centroids against the query, keep
    # n_probe cell ids. Bounded collect (<= n_cells rows) — this is
    # what makes the codes read a LITERAL IN-filter the parquet
    # source prunes partitions with.
    probe_rows = (
        index["centroids"]
        .crossJoin(F.broadcast(q))
        .select(
            "cid",
            F.round(F.sqrt(_sq_euclid(F.col("c"), F.col("qe"))), 6).alias("qd"),
        )
        .collect()
    )
    probe_cells = [
        r["cid"] for r in sorted(probe_rows, key=lambda r: (r["qd"], r["cid"]))
    ][:n_probe]
    qsubs = q.select(
        F.explode(
            F.array(*_subvector_structs("qe", n_subspaces, sub_d))
        ).alias("x")
    ).select("x.sub_id", F.col("x.sv").alias("qv"))
    dsub = F.round(F.sqrt(_sq_euclid(F.col("cv"), F.col("qv"))), 6)
    adc = (
        index["codebooks"]
        .join(F.broadcast(qsubs), "sub_id")
        .select("sub_id", "code", (dsub * dsub).alias("d2sub"))
    )
    approx = (
        codes.filter(
            F.col("cell").isin([int(c) for c in probe_cells])
            & (F.col("vec_id") != query_vec_id)
        )
        .join(F.broadcast(adc), ["sub_id", "code"])
        .groupBy("vec_id")
        .agg(
            (
                F.floor(F.sum("d2sub") * 1000000 + 0.5).cast("long")
                / 1000000.0
            ).alias("approx_d2")
        )
    )
    short = approx.withColumn(
        "rn", F.row_number().over(Window.orderBy("approx_d2", "vec_id"))
    ).filter(F.col("rn") <= shortlist)
    exact = (
        short.join(
            vectors.select(
                "vec_id", _to_double(F.col("embedding")).alias("e")
            ),
            "vec_id",
        )
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "approx_d2",
            F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("qe"))), 6).alias(
                "exact_dist"
            ),
        )
    )
    return (
        exact.withColumn(
            "rank",
            F.row_number().over(Window.orderBy("exact_dist", "vec_id")),
        )
        .filter(F.col("rank") <= k)
        .select("rank", "vec_id", "approx_d2", "exact_dist")
        .orderBy("rank")
    )


IVFPQ_TUNE_QUERIES = 8
IVFPQ_TUNE_PROBES = (1, 2, 4, 8)
IVFPQ_TUNE_SHORTLISTS = (10, 30, 60, 120, 500)
IVFPQ_RECALL_TARGET = 0.95


def ivfpq_tuning_curve(
    index: dict,
    vectors: DataFrame,
    n_queries: int = IVFPQ_TUNE_QUERIES,
    k: int = IVFPQ_K,
    probes: tuple = IVFPQ_TUNE_PROBES,
    shortlists: tuple = IVFPQ_TUNE_SHORTLISTS,
    target: float = IVFPQ_RECALL_TARGET,
    n_subspaces: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """The (n_probe, shortlist) tuning step VERDICT r4 ask #2 calls
    for — the IVF-PQ twin of dedup's `lsh_tuning_curve`: evaluate the
    full config grid against the exact top-k ground truth over
    `n_queries` probe queries, decompose each config's recall loss
    into CELL misses (true neighbor in an unprobed cell — raise
    n_probe) and ADC misses (in a probed cell but shortlisted out by
    quantized distance — raise shortlist/codebook_k), and CHOOSE the
    cheapest config meeting recall >= `target` (probe cost =
    mean candidates ADC-scanned + shortlist vectors fetched; if no
    config reaches target, the max-recall config is chosen).

    One plan evaluates every config: the per-(query, vector) ADC
    distance is config-INDEPENDENT, so it computes once; n_probe only
    filters by the vector's cell rank and shortlist only cuts the
    approx ranking — both applied as tiny dimension-table joins over
    the n_queries-bounded scored relation. No per-config re-scan of
    the corpus, no rebuild: the index is the maintained artifact.

    Output: one row per config + the chosen flag — the table a
    serving rollout reads to set its probe parameters."""
    sub_d = dim // n_subspaces
    nq = n_queries
    corpus = vectors.select(
        "vec_id", _to_double(F.col("embedding")).alias("e")
    )
    qs = corpus.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    # per-query cell ranking: n_cells x n_queries rows — a bounded
    # planner step (same device as ann_ivfpq_serve's probe-cell
    # collect). Materializing it as a literal table keeps the
    # centroid-ranking subtree out of every downstream branch of the
    # big eval plan.
    spark = vectors.sparkSession
    crank_rows = (
        index["centroids"]
        .crossJoin(F.broadcast(qs))
        .select(
            "qid",
            "cid",
            F.round(F.sqrt(_sq_euclid(F.col("c"), F.col("qe"))), 6).alias(
                "qd"
            ),
        )
        .collect()
    )
    ranked = {}
    for r in sorted(crank_rows, key=lambda r: (r["qid"], r["qd"], r["cid"])):
        ranked.setdefault(r["qid"], []).append(r["cid"])
    crank = spark.createDataFrame(
        [
            (qid, cid, rank + 1)
            for qid, cids in ranked.items()
            for rank, cid in enumerate(cids)
        ],
        "qid long, cid long, cr long",
    )
    qsubs = qs.select(
        "qid",
        F.explode(
            F.array(*_subvector_structs("qe", n_subspaces, sub_d))
        ).alias("x"),
    ).select("qid", "x.sub_id", F.col("x.sv").alias("qv"))
    dsub = F.round(F.sqrt(_sq_euclid(F.col("cv"), F.col("qv"))), 6)
    adc = (
        index["codebooks"]
        .join(F.broadcast(qsubs), "sub_id")
        .select("qid", "sub_id", "code", (dsub * dsub).alias("d2sub"))
    )
    vap = (
        index["codes"]
        .join(F.broadcast(adc), ["sub_id", "code"])
        .groupBy("qid", "vec_id")
        .agg(
            F.min("cell").alias("cell"),
            (
                F.floor(F.sum("d2sub") * 1000000 + 0.5).cast("long")
                / 1000000.0
            ).alias("approx_d2"),
        )
    )
    vex = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("qe"))), 6).alias(
                "d"
            ),
        )
    )
    crank_j = crank.select(
        F.col("qid").alias("c_qid"), F.col("cid"), F.col("cr")
    )
    # vm is n_queries x corpus rows and EVERY downstream branch
    # (truth, per-probe candidate cuts, the three miss decompositions)
    # fully consumes it — the persist criterion customer_rfm_scores'
    # A/B established: cache only what each branch reads whole, more
    # times than materialization costs (5 consumers here).
    vm = (
        vap.join(vex, ["qid", "vec_id"])
        .join(
            F.broadcast(crank_j),
            (F.col("qid") == F.col("c_qid"))
            & (F.col("cell") == F.col("cid")),
        )
        .select("qid", "vec_id", "approx_d2", "d", "cr")
        .persist()
    )
    # eager-pin the scored relation: every downstream branch roots at
    # the cache, which also keeps the final plan (and its one-time
    # codegen compile) small
    vm.count()
    truth = (
        vm.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d", "vec_id")
            ),
        )
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", F.col("cr").alias("vcr"))
    )
    # config dimensions inline as exploded literal arrays — no join,
    # no broadcast-materialization job per reference
    ps_col = F.explode(
        F.array(*[F.lit(int(p)).cast("long") for p in probes])
    )
    ss_col = F.explode(
        F.array(*[F.lit(int(x)).cast("long") for x in shortlists])
    )
    cand = vm.select(
        "*", ps_col.alias("n_probe")
    ).filter(F.col("cr") <= F.col("n_probe"))
    ar = cand.withColumn(
        "arank",
        F.row_number().over(
            Window.partitionBy("n_probe", "qid").orderBy(
                "approx_d2", "vec_id"
            )
        ),
    )
    # served top-k ∩ truth == truth ∩ shortlist: a true top-k vector
    # inside the shortlist is never outranked in the exact re-rank (at
    # most k-1 corpus vectors have a smaller (d, vec_id), and every
    # shortlist >= k), and tie-breaks are (d, vec_id) on both sides.
    # So the exact-re-rank window drops from the eval entirely; the
    # DuckDB oracle deliberately KEEPS the naive served-top-k form,
    # independently verifying this reduction value-for-value.
    assert min(shortlists) >= k, "hits reduction requires shortlist >= k"
    hits = (
        truth.select("qid", "vec_id")
        .join(ar, ["qid", "vec_id"])
        .select("*", ss_col.alias("shortlist"))
        .groupBy("n_probe", "shortlist")
        .agg(
            F.sum(
                F.when(F.col("arank") <= F.col("shortlist"), 1).otherwise(0)
            ).cast("long").alias("n_hits")
        )
    )
    # one conditional aggregate gives the cell-miss side; truth has
    # exactly k*nq rows, so n_in_cand = k*nq - n_cell_miss (no third
    # pass needed)
    cm = (
        truth.select("*", ps_col.alias("n_probe"))
        .groupBy("n_probe")
        .agg(
            F.sum(
                F.when(F.col("vcr") > F.col("n_probe"), 1).otherwise(0)
            ).cast("long").alias("n_cell_miss")
        )
    )
    cc = cand.groupBy("n_probe").agg(F.count(F.lit(1)).alias("n_cand"))
    grid = spark.createDataFrame(
        [(int(p), int(x)) for p in probes for x in shortlists],
        "n_probe long, shortlist long",
    )
    rpt = (
        grid.join(hits, ["n_probe", "shortlist"], "left")
        .join(cm, "n_probe", "left")
        .join(cc, "n_probe", "left")
        .select(
            "n_probe",
            "shortlist",
            (
                F.floor(
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(k * nq))
                    * 10000
                    + 0.5
                ).cast("long")
                / 10000.0
            ).alias("recall_at_k"),
            F.coalesce(F.col("n_cell_miss"), F.lit(0))
            .cast("long")
            .alias("n_cell_miss"),
            (
                F.lit(k * nq)
                - F.coalesce(F.col("n_cell_miss"), F.lit(0))
                - F.coalesce(F.col("n_hits"), F.lit(0))
            ).cast("long").alias("n_adc_miss"),
            (
                F.floor(
                    F.coalesce(F.col("n_cand"), F.lit(0))
                    / F.lit(float(nq))
                    * 100
                    + 0.5
                ).cast("long")
                / 100.0
            ).alias("mean_candidates"),
        )
        .withColumn(
            "probe_cost", F.col("mean_candidates") + F.col("shortlist")
        )
    )
    eligible = F.when(F.col("recall_at_k") >= target, 0).otherwise(1)
    tiebreak = F.when(
        F.col("recall_at_k") >= target, F.col("probe_cost")
    ).otherwise(-F.col("recall_at_k"))
    out = (
        rpt.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(
                    eligible, tiebreak, "n_probe", "shortlist"
                )
            ),
        )
        .select(
            "n_probe",
            "shortlist",
            "recall_at_k",
            "n_cell_miss",
            "n_adc_miss",
            "mean_candidates",
            "probe_cost",
            (F.col("rn") == 1).cast("long").alias("chosen"),
        )
        .orderBy("n_probe", "shortlist")
    )
    # drain into the |grid|-row report and release the vm pin (ADVICE
    # r5: long-lived sessions otherwise accumulate cached relations)
    rows = out.collect()
    vm.unpersist()
    return spark.createDataFrame(rows, out.schema)


def ivfpq_index_stats(index: dict) -> DataFrame:
    """Index-artifact audit (the check a maintained index runs after
    every add/compaction cycle): per cell — vector occupancy, load
    share (the shard-balance signal ivf_shard_plan consumes), the
    number of distinct (subspace, code) entries actually used (dead
    codebook entries ⇒ retrain signal), and the stored size estimate
    at 1 byte/code (the IO unit the ADC probe reads).

    Scale shape: one groupBy over the codes table — mergeable
    partials, |cells| output rows, no window over the corpus."""
    codes = index["codes"]
    wall = Window.partitionBy()
    per_cell = codes.groupBy("cell").agg(
        F.countDistinct("vec_id").alias("n_vectors"),
        F.countDistinct("sub_id", "code").alias("n_used_codes"),
        F.count(F.lit(1)).alias("n_code_rows"),
    )
    return per_cell.select(
        "cell",
        "n_vectors",
        "n_used_codes",
        F.col("n_code_rows").cast("long").alias("bytes_est"),
        (
            F.floor(
                F.col("n_vectors")
                / F.sum("n_vectors").over(wall)
                * 1000000
                + 0.5
            ).cast("long")
            / 1000000.0
        ).alias("load_share"),
    ).orderBy("cell")


IVFPQ_SERVE_BATCH = (1, 2, 3, 4)  # the registry's probe query batch


def ann_ivfpq_serve_batch(
    index: dict,
    vectors: DataFrame,
    query_ids=IVFPQ_SERVE_BATCH,
    k: int = IVFPQ_K,
    n_probe: int = IVFPQ_NPROBE,
    shortlist: int = IVFPQ_SHORTLIST,
    n_subspaces: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
    extra_codes: DataFrame | None = None,
) -> DataFrame:
    """Serve a QUERY BATCH against the maintained IVF-PQ artifact in
    ONE plan (VERDICT r5 ask #7) — the throughput shape of a real
    serving tier, where queries arrive in micro-batches and the index
    is read once per batch, not once per query:

    - the per-query probe-cell ranking is ONE bounded planner collect
      (n_cells x |queries| rows — ann_ivfpq_serve's device batched);
    - the codes table is read ONCE with the UNION of all probed cells
      as a literal partition filter (cell pruning survives batching),
      then each code row meets only the queries that probed its cell
      via a broadcast (qid, cell) pair join;
    - ADC tables for all queries ride one broadcast keyed by
      (qid, sub_id, code) — cosine_topk_batch's broadcast pattern;
    - shortlist and exact re-rank are qid-PARTITIONED windows (per-
      query width ≤ shortlist — never a global window).

    Cost: linear in |queries| (ADC rows scanned = Σ per-query probed
    cells), flat in corpus size beyond the probed partitions. Same
    determinism devices as ann_ivfpq_serve, so the DuckDB full-
    rebuild replay matches per query."""
    sub_d = dim // n_subspaces
    spark = vectors.sparkSession
    codes = index["codes"]
    if extra_codes is not None:
        codes = codes.unionByName(extra_codes)
    qids = [int(q) for q in query_ids]
    qs = vectors.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"),
        _to_double(F.col("embedding")).alias("qe"),
    )
    # bounded planner step: n_cells x |queries| centroid ranks
    crank_rows = (
        index["centroids"]
        .crossJoin(F.broadcast(qs))
        .select(
            "qid",
            "cid",
            F.round(F.sqrt(_sq_euclid(F.col("c"), F.col("qe"))), 6).alias(
                "qd"
            ),
        )
        .collect()
    )
    by_q: dict = {}
    for r in sorted(crank_rows, key=lambda r: (r["qid"], r["qd"], r["cid"])):
        by_q.setdefault(r["qid"], []).append(int(r["cid"]))
    probe_pairs = [
        (int(qid), cid) for qid, cids in by_q.items() for cid in cids[:n_probe]
    ]
    union_cells = sorted({c for _, c in probe_pairs})
    pairs_df = spark.createDataFrame(probe_pairs, "qid long, cell long")
    qsubs = qs.select(
        "qid",
        F.explode(
            F.array(*_subvector_structs("qe", n_subspaces, sub_d))
        ).alias("x"),
    ).select("qid", "x.sub_id", F.col("x.sv").alias("qv"))
    dsub = F.round(F.sqrt(_sq_euclid(F.col("cv"), F.col("qv"))), 6)
    adc = (
        index["codebooks"]
        .join(F.broadcast(qsubs), "sub_id")
        .select("qid", "sub_id", "code", (dsub * dsub).alias("d2sub"))
    )
    approx = (
        codes.filter(F.col("cell").isin(union_cells))
        .join(F.broadcast(pairs_df), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(adc), ["qid", "sub_id", "code"])
        .groupBy("qid", "vec_id")
        .agg(
            (
                F.floor(F.sum("d2sub") * 1000000 + 0.5).cast("long")
                / 1000000.0
            ).alias("approx_d2")
        )
    )
    short = approx.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("qid").orderBy("approx_d2", "vec_id")
        ),
    ).filter(F.col("rn") <= shortlist)
    exact = (
        short.join(
            vectors.select(
                "vec_id", _to_double(F.col("embedding")).alias("e")
            ),
            "vec_id",
        )
        .join(F.broadcast(qs), "qid")
        .select(
            "qid",
            "vec_id",
            "approx_d2",
            F.round(F.sqrt(_sq_euclid(F.col("e"), F.col("qe"))), 6).alias(
                "exact_dist"
            ),
        )
    )
    return (
        exact.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("exact_dist", "vec_id")
            ),
        )
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_vec_id"),
            "rank",
            "vec_id",
            "approx_d2",
            "exact_dist",
        )
        .orderBy("query_vec_id", "rank")
    )


def ivfpq_erase(
    spark, path: str, erase_ids: DataFrame, seg_id: int | str | None = None
) -> dict:
    """Right-to-be-forgotten reaching the maintained IVF-PQ artifact:
    publish a TOMBSTONE SEGMENT for the given subjects' vec_ids. At
    100 TB the index cannot be rebuilt per erasure request — instead
    the erase set is written cell-partitioned under `tombstones/
    seg_id=N` (cells looked up from the live codes, so the serve-time
    tombstone read prunes to the probed cells exactly like the codes
    read), excluded at serve via a broadcast anti-join on vec_id
    (read_ivfpq_index_serving), and folded PERMANENTLY out of the
    codes at the next ivfpq_compact_segments.

    Semantics: a tombstone suppresses the vec_id across base AND every
    un-compacted add segment — including an add published AFTER the
    erasure (the subject must not reappear). Compaction physically
    drops the rows and clears the tombstones; only a post-compaction
    re-add (re-consent) serves the id again. The frozen quantizers are
    aggregate model parameters, not per-subject data — erasure does
    not retrain them, matching how deployed ANN systems treat
    codebooks under GDPR.

    Cost: one vec_id-keyed semi-join of the erase set against the
    codes (request-sized output), one small parquet write. Returns
    {"seg_id", "n_ids", "n_cells"}.

    `seg_id`: explicit segment key — pass a batch-derived key from
    foreachBatch (run_ivfpq_erase_stream) so a replayed micro-batch
    OVERWRITES its own segment instead of appending a duplicate
    (at-least-once safety, the adds-segment discipline). None → a
    fresh uuid, not max+1 over a directory listing — concurrent
    un-keyed erases must not race the listing and overwrite each
    other's segment (VERDICT r9 #1).
    """
    import os
    import uuid

    from . import artifact_lifecycle as alc
    from .dedup import require_local_index_path

    require_local_index_path("ivfpq_erase", path)
    alc.recover_torn_compaction(path, "codes")
    ids = erase_ids.select("vec_id").distinct()
    codes = read_ivfpq_index_with_adds(spark, path)["codes"]
    cells = (
        codes.join(F.broadcast(ids), "vec_id")
        .select("vec_id", "cell")
        .distinct()
    )
    ts_dir = os.path.join(path, "tombstones")
    # an id with no codes rows YET (erase raced ahead of its add) must
    # still tombstone — cell -1 (no partition to prune, anti-join on
    # vec_id still suppresses it when the add lands)
    found_rows = cells.collect()  # bounded: request-sized
    found = {r.vec_id for r in found_rows}
    missing = [
        (int(r.vec_id), -1)
        for r in ids.collect()
        if r.vec_id not in found
    ]
    if seg_id is None:
        seg_id = uuid.uuid4().hex
    rows = [(int(r.vec_id), int(r.cell)) for r in found_rows] + missing
    out = spark.createDataFrame(rows, "vec_id long, cell long")
    out.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(ts_dir, f"seg_id={seg_id}")
    )
    return {
        "seg_id": seg_id,
        "n_ids": len({v for v, _ in rows}),
        "n_cells": len({c for _, c in rows if c >= 0}),
    }


def read_ivfpq_tombstones(spark, path: str) -> DataFrame | None:
    """Union of all published tombstone segments as (vec_id, cell);
    None when no erasures are pending."""
    import os

    from .dedup import require_local_index_path

    require_local_index_path("read_ivfpq_tombstones", path)
    ts_dir = os.path.join(path, "tombstones")
    if os.path.isdir(ts_dir) and any(
        e.startswith("seg_id=") for e in os.listdir(ts_dir)
    ):
        return _rpp(spark, ts_dir).select(
            "vec_id", F.col("cell").cast("long").alias("cell")
        )
    return None


def read_ivfpq_index_serving(spark, path: str) -> dict:
    """THE serve-time artifact read: base codes ∪ un-compacted add
    segments, MINUS tombstoned vec_ids (broadcast anti-join — erase
    sets are request-sized). Every serve over an index with pending
    erasures must read through this, so an erased subject can never
    appear in a shortlist even before compaction folds its rows."""
    from .dedup import require_local_index_path

    require_local_index_path("read_ivfpq_index_serving", path)
    index = read_ivfpq_index_with_adds(spark, path)
    ts = read_ivfpq_tombstones(spark, path)
    if ts is not None:
        index["codes"] = index["codes"].join(
            F.broadcast(ts.select("vec_id")), "vec_id", "left_anti"
        )
    return index


def ivfpq_erasure_audit(spark, path: str) -> DataFrame:
    """Per-cell erasure ledger of the maintained artifact — the
    governance view gdpr_erasure_plan lacked: for every IVF cell,
    how many vectors still serve vs how many are tombstoned pending
    the compaction fold (and the ppm share). This is what schedules
    compaction: a cell whose tombstone share crosses policy triggers
    the fold; zero rows tombstoned everywhere == the artifact is
    clean of erased subjects.

    Scale shape: one distinct projection of the codes to (vec_id,
    cell), one broadcast anti/semi pair against the request-sized
    tombstone set, one ≤n_cells-row aggregate."""
    idx = read_ivfpq_index_with_adds(spark, path)
    vecs = idx["codes"].select("vec_id", "cell").distinct()
    ts = read_ivfpq_tombstones(spark, path)
    if ts is None:
        marked = vecs.withColumn("is_tomb", F.lit(False))
    else:
        t = ts.select("vec_id").distinct().withColumn(
            "is_tomb", F.lit(True)
        )
        marked = vecs.join(F.broadcast(t), "vec_id", "left").select(
            "vec_id",
            "cell",
            F.coalesce("is_tomb", F.lit(False)).alias("is_tomb"),
        )
    return (
        marked.groupBy("cell")
        .agg(
            F.sum(F.when(~F.col("is_tomb"), 1).otherwise(0))
            .cast("long")
            .alias("n_live"),
            F.sum(F.when(F.col("is_tomb"), 1).otherwise(0))
            .cast("long")
            .alias("n_tombstoned"),
            F.floor(
                F.sum(F.when(F.col("is_tomb"), 1).otherwise(0))
                / F.count(F.lit(1))
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("tombstoned_ppm"),
        )
        .orderBy("cell")
    )


def ivfpq_compact_segments(spark, path: str) -> dict:
    """Fold the streaming L0 segments (`codes_adds/batch_id=N`, from
    run_ivfpq_add_stream) into the base codes table AND permanently
    drop tombstoned rows (`tombstones/seg_id=N`, from ivfpq_erase) —
    the compaction half of the maintained-index lifecycle. Serving
    reads get faster (one cell directory per cell instead of
    1 + |segments|, no anti-join), the segment and tombstone areas
    empty, and erased subjects' codes leave the physical artifact;
    quantizers are untouched (surviving codes only move, they never
    re-encode, so compaction can never change a SERVE result — the
    serving read already excluded tombstoned rows; pytest asserts
    serve-before == serve-after across erase/add interleavings).

    Publish protocol on a plain filesystem: the merged codes land in
    a scratch directory, then swap in via rename — CRASH-FENCED
    (VERDICT r8 #1) by the shared epoch-marker protocol
    (operators/artifact_lifecycle.py): the segment list is recorded
    in a pending marker before the fold, the fold reads ONLY the
    listed segments, the target epoch publishes atomically with the
    codes directory, and recovery (run by the serving reads, the
    erase, and the compactor) rolls a torn state forward or back —
    a crash between the rename-swap and the segment retirement can
    no longer re-union the adds into duplicate code rows. (A table
    format — Iceberg/Delta — would make this whole dance a metadata
    commit; the physical layout written here is identical.) Returns
    {"n_segments", "n_rows", "n_tombstoned"} of what was folded.
    """
    import os
    import uuid

    from . import artifact_lifecycle as alc
    from .dedup import require_local_index_path

    require_local_index_path("ivfpq_compact_segments", path)
    alc.recover_torn_compaction(path, "codes")
    specs = [("codes_adds", "batch_id"), ("tombstones", "seg_id")]
    segs = alc.list_segment_dirs(path, specs)
    if not segs:
        return {"n_segments": 0, "n_rows": 0, "n_tombstoned": 0}
    marker = alc.begin_compaction(path, "codes", segs)
    add_segs = [s for s in segs if s.startswith("codes_adds/")]
    ts_segs = [s for s in segs if s.startswith("tombstones/")]
    merged = _rpp(spark, os.path.join(path, "codes")).select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "sub_id", "code"
    )
    # per-segment reads (each segment dir is itself cell-partitioned,
    # so a single multi-root read would trip partition discovery)
    def _union(segs, cols):
        parts = [
            _rpp(spark, os.path.join(path, s)).select(*cols)
            for s in segs
        ]
        out = parts[0]
        for pt in parts[1:]:
            out = out.unionByName(pt)
        return out

    n_rows = 0
    if add_segs:
        adds = _union(
            add_segs,
            [
                "vec_id",
                F.col("cell").cast("long").alias("cell"),
                "sub_id",
                "code",
            ],
        )
        n_rows = int(adds.count())
        merged = merged.unionByName(adds)
    n_tombstoned = 0
    if ts_segs:
        ts = _union(ts_segs, ["vec_id"]).distinct()
        n_tombstoned = int(ts.count())
        merged = merged.join(F.broadcast(ts), "vec_id", "left_anti")
    scratch = os.path.join(path, f".codes_compact_{uuid.uuid4().hex}")
    merged.write.partitionBy("cell").parquet(scratch)
    from .dedup import require_nonempty_parquet_scratch

    require_nonempty_parquet_scratch(scratch, "IVF-PQ codes")
    alc.stamp_scratch_epoch(scratch, marker["to_epoch"])
    alc.publish_base(path, "codes", scratch)
    alc.finish_compaction(path, marker)
    return {
        "n_segments": len(add_segs),
        "n_rows": n_rows,
        "n_tombstoned": n_tombstoned,
    }


# ------------------------------------------------------------------
# Johnson-Lindenstrauss random projection — the sketching step ahead
# of ANN when the raw dimensionality is the cost driver.
# ------------------------------------------------------------------

JL_DIMS = 8  # target dimensionality (interpolated into the oracle)
JL_PAIR_BAND = 0.5  # distortion band half-width for the within count


def _jl_sign_py(j: int, d: int) -> float:
    """±1 Rademacher component (j = output dim, d = input dim):
    +1 iff the first md5 hex digit of 'j{j}d{d}' is >= 8 — the same
    formula the DuckDB oracle evaluates in SQL (registry). Computed
    driver-side once and baked into the plan as literals, so the
    executor-side projection is pure constant-folded arithmetic (no
    per-row hashing)."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"j{j}d{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0


def jl_project(emb: Column, k: int = JL_DIMS, dims: int = 64) -> Column:
    """array<double> JL projection of a dims-dimensional embedding to
    k dims: p[j] = <emb, s_j> / sqrt(k) with deterministic ±1 signs.
    Distance-preserving in expectation (E[|p(a)-p(b)|²] = |a-b|²).
    All JVM higher-order functions inside whole-stage codegen."""
    inv = 1.0 / float(np.sqrt(k))
    return F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        emb,
                        F.array(
                            *[F.lit(_jl_sign_py(j, d)) for d in range(dims)]
                        ),
                        lambda x, s: x * s,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                * inv
            )
            for j in range(k)
        ]
    )


def _l2sq(u: Column, v: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def jl_projection_distortion(
    embeddings: DataFrame, k: int = JL_DIMS
) -> DataFrame:
    """JL sketch quality audit over consecutive-id vector pairs
    (v, v+1): the squared-distance ratio |p(a)-p(b)|² / |a-b|² per
    pair, reported as (n_pairs, mean/min/max ratio, pairs within the
    ±50% band). A mean near 1.0 certifies the sketch is unbiased;
    the band count is the operational guarantee an ANN shortlist
    built on the sketch relies on.

    Scale shape: the projection is per-row constant-folded
    arithmetic (literal sign matrix — no hashing, no join, no
    broadcast); the pair join is one equi-join on vec_id (keyed
    shuffle, uniform); the report is a 1-row aggregate. Nothing
    all-pairs — the pair set is O(n) by construction.
    """
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    proj = base.select(
        "vec_id", "emb", jl_project(F.col("emb"), k).alias("p")
    )
    left = proj.select(
        "vec_id", F.col("emb").alias("ea"), F.col("p").alias("pa")
    )
    right = proj.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("emb").alias("eb"),
        F.col("p").alias("pb"),
    )
    pairs = left.join(right, "vec_id")
    r = (
        pairs.select(
            _l2sq(F.col("ea"), F.col("eb")).alias("od2"),
            _l2sq(F.col("pa"), F.col("pb")).alias("pd2"),
        )
        .filter(F.col("od2") > 0)
        .select((F.col("pd2") / F.col("od2")).alias("ratio"))
    )

    def r4(c):
        return F.floor(c * 10000 + 0.5).cast("long") / 10000.0

    lo, hi = 1.0 - JL_PAIR_BAND, 1.0 + JL_PAIR_BAND
    return r.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        r4(F.avg("ratio")).alias("mean_ratio"),
        r4(F.min("ratio")).alias("min_ratio"),
        r4(F.max("ratio")).alias("max_ratio"),
        F.sum(
            F.when((F.col("ratio") >= lo) & (F.col("ratio") <= hi), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_within_band"),
    )


JL_SHORTLIST = 40  # sketch-stage shortlist size (oracle lockstep)


def ann_jl_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    shortlist: int = JL_SHORTLIST,
    kdims: int = JL_DIMS,
) -> DataFrame:
    """Recall@k of the JL-sketch two-stage ANN against the exact
    scan, per probe query: stage 1 shortlists by squared L2 distance
    in the 8-dim sketch (8 multiplies per corpus row instead of 64),
    stage 2 exact-cosine re-ranks the shortlist. The eval that sizes
    the shortlist for a target recall — the sketch sibling of
    ann_lsh_recall (bucketing) and quantized_recall (storage).

    Probes are the first `n_queries` vec_ids (deterministic).
    Scale shape: the projection is constant-folded per-row
    arithmetic; the probe set broadcasts into both arms; both
    rankings are per-query row_numbers (WindowGroupLimit-prunable).
    Sketch distances are floor-quantized at 6 dp with vec_id
    tiebreaks so the shortlist boundary is engine-portable; cosine
    ranks round at 6 dp likewise.
    """
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    proj = base.withColumn("p", jl_project(F.col("emb"), kdims))
    queries = proj.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("p").alias("q_p"),
    )
    cos = F.round(cosine(F.col("emb"), F.col("q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    exact_k = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )
    sd2 = F.floor(
        _l2sq(F.col("p"), F.col("q_p")) * 1000000 + 0.5
    ).cast("long")
    ws = Window.partitionBy("q_id").orderBy(
        F.asc("sd2"), F.asc("vec_id")
    )
    short = (
        proj.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "emb", "q_emb", sd2.alias("sd2"))
        .withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= shortlist)
    )
    jl_k = (
        short.select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", F.col("vec_id").alias("j_vec_id"))
    )
    ex_n = exact_k.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    jl_n = jl_k.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_jl"))
    ov_n = (
        exact_k.join(
            jl_k,
            (exact_k["q_id"] == jl_k["q_id"])
            & (exact_k["vec_id"] == jl_k["j_vec_id"]),
        )
        .groupBy(exact_k["q_id"].alias("q_id"))
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        ex_n.join(jl_n, "q_id", "left")
        .join(ov_n, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce(F.col("n_jl"), F.lit(0)).alias("n_jl"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (
                F.floor(
                    F.coalesce(F.col("n_overlap"), F.lit(0))
                    / F.col("n_exact")
                    * 10000
                    + 0.5
                ).cast("long")
                / 10000.0
            ).alias("recall"),
        )
        .orderBy("q_id")
    )


JL_CURVE_SHORTLISTS = (10, 20, 40, 80)  # oracle lockstep
JL_CURVE_QUERIES = 8  # probe-query count (oracle lockstep)
JL_CURVE_K = 10  # recall@k depth (oracle lockstep)


def jl_shortlist_curve(
    embeddings: DataFrame,
    n_queries: int = JL_CURVE_QUERIES,
    k: int = JL_CURVE_K,
    kdims: int = JL_DIMS,
    shortlists: tuple = JL_CURVE_SHORTLISTS,
) -> DataFrame:
    """The shortlist-sizing curve for the JL two-stage ANN: recall@k
    at each candidate shortlist size, ALL sizes evaluated in one plan
    (the ivfpq_tuning_curve device — explode the config dimension
    instead of re-running the pipeline per setting). For shortlist s,
    the served top-k is the k best exact cosines among the s
    sketch-nearest rows; recall is overlap with the exact top-k,
    pooled over the probe queries. Monotone nondecreasing in s by
    construction — the test asserts it.

    Scale shape: sketch distances and cosines are computed ONCE per
    (query, row); the config dimension is an exploded LITERAL array
    over the already-shortlisted slice (srn <= max(s)) — the
    ivfpq_tuning_curve lesson, no non-equi join anywhere; every
    ranking window is per (q_id[, shortlist]) — bounded partitions,
    never global.
    """
    max_s = max(shortlists)
    base = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("emb")
    )
    proj = base.withColumn("p", jl_project(F.col("emb"), kdims))
    queries = proj.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("p").alias("q_p"),
    )
    sd2 = F.floor(
        _l2sq(F.col("p"), F.col("q_p")) * 1000000 + 0.5
    ).cast("long")
    cos = F.round(cosine(F.col("emb"), F.col("q_emb")), 6)
    scored = proj.join(
        F.broadcast(queries), F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id", "vec_id", cos.alias("cosine"), sd2.alias("sd2")
    )
    w_exact = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    w_sketch = Window.partitionBy("q_id").orderBy(
        F.asc("sd2"), F.asc("vec_id")
    )
    ranked = scored.select(
        "q_id",
        "vec_id",
        "cosine",
        F.row_number().over(w_exact).alias("rn_exact"),
        F.row_number().over(w_sketch).alias("srn"),
    ).filter(F.col("srn") <= max_s)
    expanded = ranked.select(
        "*",
        F.explode(
            F.array(*[F.lit(int(s)) for s in shortlists])
        ).alias("shortlist"),
    ).filter(F.col("srn") <= F.col("shortlist"))
    w_jl = Window.partitionBy("q_id", "shortlist").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    hits = (
        expanded.withColumn("jl_rank", F.row_number().over(w_jl))
        .filter((F.col("jl_rank") <= k) & (F.col("rn_exact") <= k))
    )
    return (
        hits.groupBy("shortlist")
        .agg(
            F.countDistinct("q_id").alias("n_queries_hit"),
            F.count(F.lit(1)).alias("n_hits"),
            (
                F.floor(
                    F.count(F.lit(1)) / (k * n_queries) * 10000 + 0.5
                ).cast("long")
                / 10000.0
            ).alias("recall"),
        )
        .orderBy("shortlist")
    )
