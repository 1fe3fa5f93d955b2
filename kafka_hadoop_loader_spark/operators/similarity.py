"""Similarity search over embedding vectors (BASELINE.json:6 mandate;
``embeddings`` fixture: 64-dim float vectors + cluster-ish labels).

Two paths:

- brute-force top-k cosine: the exactness baseline.  Query side is tiny
  and broadcast; dot products are JVM higher-order-function folds
  (zip_with + aggregate in whole-stage codegen — no Python, no UDF).
  Cross-engine bitwise determinism verified: Spark's sequential fold ==
  DuckDB's list_cosine_similarity on double-cast lists.
- LSH-bucketed ANN (random hyperplanes): the scale path — candidates
  share >=1 of `n_tables` sign-pattern buckets, exact cosine re-rank on
  candidates only.  Rows-only (bucket membership depends on engine hash
  constants); pytest measures recall vs brute force.

Scale notes: brute force is O(Q*N) — fine for Q small (broadcast); for
N x N all-pairs use the LSH path, whose cost is sum of bucket sizes
squared, controlled by hyperplane count.  Both avoid any driver-side
collect; vectors stay in arrays end-to-end.  At 100 TB, replace the
random-hyperplane table with IVF centroids learned offline and
partition by centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import managed_persist, spread, table
from kafka_hadoop_loader_spark.functions.exact import exact_avg
from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key
from kafka_hadoop_loader_spark.registry import register

K = 10
N_QUERIES = 20

_LSH_TABLES, _LSH_BITS, _LSH_DIM = 8, 4, 64
_LSH_SCALE = 10**6  # per-term projection quantum (scaled-BIGINT sum is exact)


def _lsh_coef(t: int, bbit: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    sha256 of (table, bit, dim) — no RNG at runtime, and replayable as a
    literal VALUES table in the DuckDB oracle."""
    import hashlib

    h = int.from_bytes(hashlib.sha256(f"{t}:{bbit}:{d}".encode()).digest()[:8], "big")
    return (h / float(1 << 63)) - 1.0


def _lsh_oracle() -> str:
    """DuckDB replay of knn_cosine_lsh.

    Exactness argument: the only floats that cross an aggregation are the
    32 projections, and those are summed as scaled BIGINTs (round((v*c)*S)
    per term — both engines compute the identical double product from the
    identical literal coefficient, so the rounded int64 terms are equal and
    integer addition is order-free).  Bucket keys are pure integer logic on
    the signs; the re-rank cosine is the same per-row sequential fold
    knn_cosine_bruteforce already hash-matches."""
    tb = [(t, b) for t in range(_LSH_TABLES) for b in range(_LSH_BITS)]
    coef_cols = ", ".join(f"c_{t}_{b}" for t, b in tb)
    rows = ",\n            ".join(
        f"({d}, " + ", ".join(repr(_lsh_coef(t, b, d)) for t, b in tb) + ")"
        for d in range(_LSH_DIM)
    )
    proj_cols = ",\n                   ".join(
        f"SUM(CAST(ROUND(v * c_{t}_{b} * {float(_LSH_SCALE)}) AS BIGINT)) AS p_{t}_{b}"
        for t, b in tb
    )
    key_cols = ",\n                   ".join(
        "("
        + " + ".join(
            f"CASE WHEN p_{t}_{b} > 0 THEN {1 << b} ELSE 0 END"
            for b in range(_LSH_BITS)
        )
        + f") AS bk{t}"
        for t in range(_LSH_TABLES)
    )
    key_case = (
        "CASE tt.t "
        + " ".join(f"WHEN {t} THEN s.bk{t}" for t in range(_LSH_TABLES))
        + " END"
    )
    t_vals = ", ".join(f"({t})" for t in range(_LSH_TABLES))
    return f"""
        WITH ctab(d, {coef_cols}) AS (VALUES
            {rows}
        ),
        pos AS (
            SELECT vec_id, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS v
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        proj AS (
            SELECT vec_id,
                   {proj_cols}
            FROM pos JOIN ctab USING (d)
            GROUP BY vec_id
        ),
        sigs AS (
            SELECT vec_id,
                   {key_cols}
            FROM proj
        ),
        buckets AS (
            SELECT s.vec_id, tt.t, {key_case} AS key
            FROM sigs s CROSS JOIN (VALUES {t_vals}) AS tt(t)
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM buckets q JOIN buckets c ON q.t = c.t AND q.key = c.key
            WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   ce.label AS neighbor_label,
                   list_cosine_similarity(qe.embedding::DOUBLE[],
                                          ce.embedding::DOUBLE[]) AS cos_sim
            FROM cand
            JOIN embeddings qe ON qe.vec_id = cand.query_id
            JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, neighbor_label, cos_sim,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id)
                          AS rnk
            FROM scored
        )
        WHERE rnk <= {K}
        ORDER BY query_id, rnk
    """


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision fold — bitwise equal to DuckDB's
    list_cosine_similarity numerator on the same inputs."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# Shared by knn_cosine_bruteforce and knn_cosine_blocked: both are exact
# top-K cosine and must produce identical rows, so they share one oracle.
_BF_ORACLE = f"""
        WITH pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   c.label AS neighbor_label,
                   list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]) AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, neighbor_label, cos_sim,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id)
                          AS rnk
            FROM pairs
        )
        WHERE rnk <= {K}
        ORDER BY query_id, rnk
    """


@register(
    "knn_cosine_bruteforce",
    oracle=_BF_ORACLE,
    doc=f"""Exact top-{K} cosine neighbors for the first {N_QUERIES} query
    vectors: broadcast queries x all candidates, JVM fold dot products,
    row_number re-rank.  The correctness baseline for the ANN path.""",
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= K)
        .orderBy("query_id", "rnk")
    )


@register(
    "embedding_norms",
    oracle="""
        SELECT vec_id, label,
               sqrt(list_reduce(list_prepend(0.0,
                   [embedding[i]::DOUBLE * embedding[i]::DOUBLE
                    for i in generate_series(1, len(embedding))]),
                   (x, y) -> x + y)) AS l2_norm,
               CAST(len(embedding) AS INTEGER) AS dim
        FROM embeddings
        ORDER BY vec_id
    """,
    doc="""Vector norms: per-row sequential fold (deterministic) + sqrt
    (IEEE-correctly-rounded) — the normalize step of any embedding
    pipeline, bit-identical across engines.""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.sqrt(dot(e, e)).alias("l2_norm"),
        F.size(e).alias("dim"),
    ).orderBy("vec_id")


@register(
    "knn_cosine_lsh",
    oracle=_lsh_oracle(),
    doc=f"""ANN top-{K} via random-hyperplane LSH: 8 tables x 4-bit
    sign-pattern bucket keys; candidates = pairs sharing a bucket in any
    table; exact cosine re-rank on candidates only.  Parameters chosen
    by measured sweep on the fixtures: recall@10 ~0.65 while scanning
    ~40% of candidates — the fixture vectors are near-random (weak
    angular structure), which bounds any ANN method's recall; pytest
    asserts recall >= 0.5 vs knn_cosine_bruteforce.  Hyperplanes are
    pseudo-random from fixed integer seeds (sha256 of (table, bit, dim)
    scaled to [-1,1]) so the run is deterministic.  Oracle-checked: the
    32 projections are scaled-BIGINT sums (order-independent signs), so
    the DuckDB replay — same literal coefficient table, same integer
    bucket keys, same fold cosine — agrees bitwise.""",
)
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    dim = _LSH_DIM
    n_tables, n_bits = _LSH_TABLES, _LSH_BITS

    # All 32 projections in one codegen'd pass: posexplode the vector,
    # broadcast-join the 64-row coefficient table on the dimension index,
    # then 32 sum() aggregates grouped by vec_id.  ~3x faster than 32
    # zip_with+aggregate folds (higher-order-function lambdas evaluate
    # per element outside whole-stage codegen), and the shape scales: the
    # shuffle carries 32 longs per vector, partials combine map-side.
    # Each term is quantized to a scaled BIGINT before summing, so the
    # projection's sign — all the bucket key consumes — is independent of
    # partial-aggregation order (and exactly reproducible by the oracle).
    coef_rows = [
        (d, *[_lsh_coef(t, b, d) for t in range(n_tables) for b in range(n_bits)])
        for d in range(dim)
    ]
    coef_cols = ["d"] + [f"c_{t}_{b}" for t in range(n_tables) for b in range(n_bits)]
    ctab = spark.createDataFrame(coef_rows, coef_cols)

    pos = emb.select("vec_id", F.posexplode("embedding").alias("d", "v"))
    proj = (
        pos.join(F.broadcast(ctab), "d")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(
                    F.round(
                        F.col("v").cast("double")
                        * F.col(f"c_{t}_{b}")
                        * float(_LSH_SCALE)
                    ).cast("long")
                ).alias(f"p_{t}_{b}")
                for t in range(n_tables)
                for b in range(n_bits)
            ]
        )
    )

    def bucket_key(t: int) -> Column:
        key = F.lit(0).cast("long")
        for bbit in range(n_bits):
            key = key.bitwiseOR(
                F.when(
                    F.col(f"p_{t}_{bbit}") > 0,
                    F.shiftleft(F.lit(1).cast("long"), bbit),
                ).otherwise(0)
            )
        return key

    sigs = emb.join(
        proj.select("vec_id", *[bucket_key(t).alias(f"bk{t}") for t in range(n_tables)]),
        "vec_id",
    )
    # persisted: both join sides derive from this table; without it the
    # 32 hyperplane folds run twice (once per side).  At scale this is
    # the precomputed index you'd write once and reuse across queries.
    buckets = (
        sigs.select(
            "vec_id",
            "label",
            "embedding",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("t"), F.col(f"bk{t}").alias("key"))
                        for t in range(n_tables)
                    ]
                )
            ).alias("b"),
        )
        .select(
            "vec_id", "label", "embedding", F.col("b.t").alias("t"), F.col("b.key").alias("key")
        )
    )
    buckets = managed_persist(f"knn_lsh:buckets:{sf_dir}", buckets)

    q = buckets.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "t", "key"
    )
    c = buckets.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
        "t",
        "key",
    )
    cand = (
        q.join(c, ["t", "key"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "neighbor_label", "q_emb", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= K)
        .orderBy("query_id", "rnk")
    )


_CENT_SCALE = 10**6  # per-dim centroid average quantum
_SQ_SCALE = 10**12  # per-dim squared-diff quantum (fold is exact int64)


@register(
    "embedding_label_centroid_dist",
    oracle=f"""
        WITH pos AS (
            SELECT label, vec_id, i - 1 AS d,
                   CAST(embedding[i] AS DOUBLE) AS v
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        cent AS (
            SELECT label, d,
                   CAST(SUM(CAST(ROUND(v * {_CENT_SCALE}) AS BIGINT)) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * {float(_CENT_SCALE)}) AS c
            FROM pos GROUP BY label, d
        ),
        cvec AS (
            SELECT label, list(c ORDER BY d) AS centroid
            FROM cent GROUP BY label
        ),
        dists AS (
            SELECT e.label,
                   sqrt(CAST(list_sum(list_transform(
                            list_zip(e.embedding::DOUBLE[], cv.centroid),
                            s -> CAST(ROUND((s[1] - s[2]) * (s[1] - s[2])
                                            * {float(_SQ_SCALE)}) AS BIGINT)
                        )) AS DOUBLE) / {float(_SQ_SCALE)}) AS dist
            FROM embeddings e JOIN cvec cv USING (label)
        )
        SELECT label,
               COUNT(*) AS n_vecs,
               CAST(SUM(CAST(ROUND(dist * {_CENT_SCALE}) AS BIGINT)) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * {float(_CENT_SCALE)}) AS mean_dist,
               MAX(dist) AS max_dist
        FROM dists GROUP BY label ORDER BY label
    """,
    doc="""Per-label centroid + mean distance-to-centroid (cluster
    compactness) — grouped vector average via per-dimension explode, a
    pattern for embedding-quality monitoring.  Oracle-checked by making
    every float shuffle-order-independent (functions/exact.py pattern):
    the per-dim centroid is a scaled-BIGINT average, the per-vector
    distance folds scaled-BIGINT squared diffs (an exact int sum inside
    the array, no extra shuffle), and the per-label mean quantizes the
    bitwise-identical dist doubles once more.  MAX is order-free.""",
)
def embedding_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    # explode to (label, dim, value), exact average per (label, dim),
    # re-assemble into an ordered centroid vector per label
    pos = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("d", "v")
    )
    cent = (
        pos.groupBy("label", "d")
        .agg(exact_avg(F.col("v").cast("double"), _CENT_SCALE).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
        .select("label", F.transform("dc", lambda s: s.getField("c")).alias("centroid"))
    )
    joined = emb.join(F.broadcast(cent), "label")
    sq_scaled = F.zip_with(
        F.col("embedding"),
        F.col("centroid"),
        lambda x, c: F.round(
            (x.cast("double") - c) * (x.cast("double") - c) * _SQ_SCALE
        ).cast("long"),
    )
    dist = F.sqrt(
        F.aggregate(sq_scaled, F.lit(0).cast("long"), lambda a, v: a + v).cast(
            "double"
        )
        / F.lit(float(_SQ_SCALE))
    )
    return (
        joined.select("label", dist.alias("dist"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            exact_avg(F.col("dist"), _CENT_SCALE).alias("mean_dist"),
            F.max("dist").alias("max_dist"),
        )
        .orderBy("label")
    )


_FOLD_DOT = (
    "list_reduce(list_prepend(0.0, [{a}[i]::DOUBLE * {b}[i]::DOUBLE "
    "for i in generate_series(1, len({a}))]), (x, y) -> x + y)"
)

# Shared IVF coarse-assignment CTE chain (pos -> cent -> cvec -> cnorm
# -> vecs -> ranked): factored out so knn_cosine_ivf and
# ann_ivf_probe_frontier replay the IDENTICAL codebook + assignment —
# the fragment-level form of ann_recall_audit's compose-the-oracles
# lockstep trick.
_IVF_ASSIGN_SQL = f"""
        pos AS (
            SELECT label, i - 1 AS d, CAST(embedding[i] AS DOUBLE) AS v
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        cent AS (
            SELECT label, d,
                   CAST(SUM(CAST(ROUND(v * {_CENT_SCALE}) AS BIGINT)) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * {float(_CENT_SCALE)}) AS c
            FROM pos GROUP BY label, d
        ),
        cvec AS (
            SELECT label AS cell, list(c ORDER BY d) AS centroid
            FROM cent GROUP BY label
        ),
        cnorm AS (
            SELECT cell, centroid,
                   sqrt({_FOLD_DOT.format(a="centroid", b="centroid")}) AS cnrm
            FROM cvec
        ),
        vecs AS (
            SELECT vec_id, label, embedding,
                   sqrt({_FOLD_DOT.format(a="embedding", b="embedding")}) AS nrm
            FROM embeddings
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY sim DESC, cell) AS rk
            FROM (
                SELECT v.vec_id, v.label, v.embedding, v.nrm, c.cell,
                       {_FOLD_DOT.format(a="v.embedding", b="c.centroid")}
                           / (v.nrm * c.cnrm) AS sim
                FROM vecs v CROSS JOIN cnorm c
            )
        )
"""


def _ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, embedding, nrm, cell, sim, rk): every vector's
    cosine to every centroid, ranked per vector — the IVF codebook +
    assignment table, memoized per (site, sf_dir) and shared by
    knn_cosine_ivf and ann_ivf_probe_frontier (build once, serve
    many).  The Spark mirror of _IVF_ASSIGN_SQL."""
    from pyspark.sql import Window

    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    e = F.col("embedding")
    with_norm = emb.select(
        "vec_id", "label", "embedding", F.sqrt(dot(e, e)).alias("nrm")
    )

    # coarse quantizer: per-label mean vectors (offline-k-means stand-in);
    # exact scaled-BIGINT averages so the codebook is order-independent
    # (and the DuckDB oracle can rebuild it bit-for-bit)
    pos = emb.select("label", F.posexplode("embedding").alias("d", "v"))
    cent = (
        pos.groupBy("label", "d")
        .agg(exact_avg(F.col("v").cast("double"), _CENT_SCALE).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
        .select(
            F.col("label").alias("cell"),
            F.transform("dc", lambda s: s.getField("c")).alias("centroid"),
        )
        .select(
            "cell",
            "centroid",
            F.sqrt(dot(F.col("centroid"), F.col("centroid"))).alias("cnrm"),
        )
    )

    # assignment: one dot-fold per (vector, cell); norms precomputed
    sim = dot(F.col("embedding"), F.col("centroid")) / (
        F.col("nrm") * F.col("cnrm")
    )
    asg_w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cell")
    )
    assign = (
        with_norm.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "label", "embedding", "nrm", "cell", sim.alias("sim")
        )
        .withColumn("rk", F.row_number().over(asg_w))
    )
    return managed_persist(f"knn_ivf:assign:{sf_dir}", assign)


@register(
    "knn_cosine_ivf",
    oracle=f"""
        WITH {_IVF_ASSIGN_SQL.strip()},
        home AS (
            SELECT vec_id AS neighbor_id, label AS neighbor_label,
                   embedding AS c_emb, nrm AS c_nrm, cell
            FROM ranked WHERE rk = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, cell
            FROM ranked WHERE rk <= 3 AND vec_id < {N_QUERIES}
        ),
        cand AS (
            SELECT DISTINCT query_id, neighbor_id, neighbor_label,
                   {_FOLD_DOT.format(a="q_emb", b="c_emb")}
                       / (q_nrm * c_nrm) AS cos_sim
            FROM probes JOIN home USING (cell)
            WHERE query_id <> neighbor_id
        )
        SELECT query_id, neighbor_id, neighbor_label, cos_sim,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id)
                          AS rnk
            FROM cand
        )
        WHERE rnk <= {K}
        ORDER BY query_id, rnk
    """,
    doc=f"""ANN top-{K} via IVF (inverted-file) coarse quantization — the
    scale path beside knn_cosine_lsh: partition vectors into Voronoi
    cells around centroids (here the per-label means stand in for an
    offline k-means codebook), store each vector in its nearest cell's
    posting list, and at query time probe only the nprobe=3 nearest
    cells (~30% of data) with exact cosine re-ranking.  Measured
    recall@{K} vs brute force ~0.52 on the near-random fixture vectors
    (pytest asserts >= 0.4).  Norms are precomputed once per vector and
    centroid so assignment does one dot-fold per (vector, cell) instead
    of three.  Oracle-checked: centroids are exact scaled-BIGINT
    averages (order-independent) and every other float is a sequential
    per-row fold, so assignment, probing, and re-ranking agree bitwise
    with the DuckDB replay.  At 100 TB this is THE layout: partition
    the table by cell id, so a query's nprobe cells map to partition
    pruning, and train the codebook offline on a sample.""",
)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    assign = _ivf_assign(spark, sf_dir)
    nprobe = 3
    home = assign.where(F.col("rk") == 1)
    probes = assign.where((F.col("rk") <= nprobe) & (F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "cell",
    )
    cands = home.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        "cell",
    )
    pair_cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        probes.join(cands, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "neighbor_label", pair_cos.alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= K)
        .orderBy("query_id", "rnk")
    )


_BLK_SHARDS = 32  # candidate shards; at 100 TB this is the partition count
_BLK_MARGIN = 16  # extra approx candidates kept per (query, shard)


def _blocked_topk_batches(cand_pdf, query_pdf):
    """Cogrouped numpy kernel: one candidate shard x the full (broadcast
    -replicated) query set -> per-query approx top-(K+margin) candidate
    ids via one float64 matrix multiply.

    BLAS reorders the reduction, so these scores are only used to PRUNE;
    the survivors are re-scored with the exact sequential JVM fold that
    the oracle hash-matches.  The margin makes the pruning safe: the
    exact top-K per shard can escape the approx top-(K+margin) only if
    16 distinct cosines sit within the ~1e-15 BLAS reordering error of
    each other, which the recall pytest locks in.
    """
    import numpy as np
    import pandas as pd

    if len(cand_pdf) == 0 or len(query_pdf) == 0:
        return pd.DataFrame({"query_id": [], "neighbor_id": []}).astype(
            {"query_id": "int64", "neighbor_id": "int64"}
        )
    cmat = np.vstack(cand_pdf["c_emb"].to_numpy()).astype(np.float64)
    qmat = np.vstack(query_pdf["q_emb"].to_numpy()).astype(np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    qn = np.linalg.norm(qmat, axis=1)
    scores = (qmat @ cmat.T) / (qn[:, None] * cn[None, :])  # Q x C
    keep = min(K + _BLK_MARGIN, scores.shape[1])
    top = np.argpartition(-scores, keep - 1, axis=1)[:, :keep]  # Q x keep
    qids = np.repeat(query_pdf["query_id"].to_numpy(), keep)
    nids = cand_pdf["neighbor_id"].to_numpy()[top.ravel()]
    return pd.DataFrame({"query_id": qids, "neighbor_id": nids})


@register(
    "knn_cosine_blocked",
    oracle=_BF_ORACLE,
    doc=f"""Blocked-matmul exact top-{K} — the vectorized form of
    knn_cosine_bruteforce and the CPU shape of the GPU brute-force ANN
    pattern.  Candidates are sharded on pmod(vec_id, {_BLK_SHARDS});
    the tiny query set is replicated to every shard by a broadcast
    crossJoin with spark.range (no driver collect), and a cogrouped
    applyInPandas computes one Q x C float64 matrix product per shard,
    keeping the approx top-(K+{_BLK_MARGIN}) per query.  Only those
    ~shards*(K+{_BLK_MARGIN}) survivors per query are re-scored with
    the exact sequential fold and re-ranked, so the output is
    bit-identical to the exhaustive oracle while the O(Q*N*D) inner
    loop runs in BLAS instead of row-at-a-time codegen.  Scale: shard
    count follows the candidate partition count; queries stay
    broadcast-sized; the exact re-rank input is O(Q * shards * K).""",
)
def knn_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    shards = spark.range(_BLK_SHARDS).select(F.col("id").cast("int").alias("shard"))
    q_rep = q.crossJoin(F.broadcast(shards))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.pmod(F.col("vec_id"), F.lit(_BLK_SHARDS)).cast("int").alias("shard"),
    )
    cand = (
        c.groupBy("shard")
        .cogroup(q_rep.groupBy("shard"))
        .applyInPandas(
            _blocked_topk_batches,
            schema=StructType(
                [
                    StructField("query_id", LongType()),
                    StructField("neighbor_id", LongType()),
                ]
            ),
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    rescored = (
        cand.join(F.broadcast(q), "query_id")
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("neighbor_label"),
                F.col("embedding").alias("c_emb"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= K)
        .orderBy("query_id", "rnk")
    )


_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8  # 8 subspaces x 8 dims, 16 codes each
_PQ_NQ, _PQ_TOPK = 10, 5
_PQ_SHORT = 25  # ADC shortlist size fed to the exact re-rank
_PQ_SCALE, _PQ_OFFSET = 10_000, 100_000  # ml.py's non-negative exact grid


def _pq_packed_views(emb: DataFrame, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The PQ grid as PACKED ARRAYS (r13 rewrite of the dim-grain long
    view): ``vecl`` = (vec_id, v[64]) whole scaled vectors, ``packed`` =
    (vec_id, m, sub[_PQ_SUB]) per-subspace slices.  Same scaled-BIGINT
    values as the oracle's ``longv`` CTE — only the layout differs: one
    row per (vector, subspace) instead of per (vector, dim), so every
    distance is an in-row integer fold instead of a 64-way-exploded
    join + hash aggregate (8x fewer rows through every PQ exchange).
    Both views are managed-persisted per (site, sf_dir): the index the
    build-once/serve-many semantic shares between knn_pq_adc and
    ann_pq_recall_audit."""
    scal = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * _PQ_SCALE).cast("long")
        + F.lit(_PQ_OFFSET),
    )
    vecl = managed_persist(
        f"knn_pq_adc:vecl:{sf_dir}", emb.select("vec_id", scal.alias("v"))
    )
    packed = vecl.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                lambda m: F.struct(
                    m.cast("bigint").alias("m"),
                    F.slice("v", m * _PQ_SUB + 1, F.lit(_PQ_SUB)).alias("sub"),
                ),
            )
        ).alias("_e"),
    ).select("vec_id", "_e.m", "_e.sub")
    packed = managed_persist(f"knn_pq_adc:packed:{sf_dir}", packed)
    return vecl, packed


@register(
    "knn_pq_adc",
    oracle=f"""
        WITH longv AS (
            SELECT vec_id, i AS dim, (i - 1) // {_PQ_SUB} AS m,
                   CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_PQ_SCALE})
                        AS BIGINT) + {_PQ_OFFSET} AS v
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        seeds AS (
            SELECT vec_id,
                   CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                       AS cid
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_PQ_K})
        ),
        cent0 AS (
            SELECT s.cid, l.m, l.dim, l.v AS c
            FROM seeds s JOIN longv l ON l.vec_id = s.vec_id
        ),
        d1 AS (
            SELECT l.vec_id, c.m, c.cid,
                   CAST(SUM((l.v - c.c) * (l.v - c.c)) AS BIGINT) AS dist2
            FROM longv l JOIN cent0 c ON c.dim = l.dim
            GROUP BY l.vec_id, c.m, c.cid
        ),
        a1 AS (
            SELECT vec_id, m, cid FROM (
                SELECT vec_id, m, cid,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist2, cid) AS rn
                FROM d1
            ) WHERE rn = 1
        ),
        cent1 AS (
            SELECT a.cid, l.m, l.dim,
                   CAST(SUM(l.v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
            FROM a1 a JOIN longv l ON l.vec_id = a.vec_id AND l.m = a.m
            GROUP BY a.cid, l.m, l.dim
        ),
        d2 AS (
            SELECT l.vec_id, c.m, c.cid,
                   CAST(SUM((l.v - c.c) * (l.v - c.c)) AS BIGINT) AS dist2
            FROM longv l JOIN cent1 c ON c.dim = l.dim
            GROUP BY l.vec_id, c.m, c.cid
        ),
        codes AS (
            SELECT vec_id, m, cid FROM (
                SELECT vec_id, m, cid,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist2, cid) AS rn
                FROM d2
            ) WHERE rn = 1
        ),
        qd AS (
            SELECT vec_id AS query_id, m, cid, dist2
            FROM d2 WHERE vec_id < {_PQ_NQ}
        ),
        adc AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   CAST(SUM(q.dist2) AS BIGINT) AS adc_dist2
            FROM codes c JOIN qd q ON q.m = c.m AND q.cid = c.cid
            WHERE c.vec_id <> q.query_id
            GROUP BY q.query_id, c.vec_id
        ),
        shortlist AS (
            SELECT query_id, neighbor_id, adc_dist2
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY adc_dist2, neighbor_id)
                              AS arnk
                FROM adc
            )
            WHERE arnk <= {_PQ_SHORT}
        ),
        exact AS (
            SELECT p.query_id, p.neighbor_id, p.adc_dist2,
                   CAST(SUM((ql.v - cl.v) * (ql.v - cl.v)) AS BIGINT)
                       AS dist2
            FROM shortlist p
            JOIN longv ql ON ql.vec_id = p.query_id
            JOIN longv cl ON cl.vec_id = p.neighbor_id
                         AND cl.dim = ql.dim
            GROUP BY p.query_id, p.neighbor_id, p.adc_dist2
        )
        SELECT query_id, neighbor_id, adc_dist2, dist2,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY dist2, neighbor_id)
                          AS rnk
            FROM exact
        )
        WHERE rnk <= {_PQ_TOPK}
        ORDER BY query_id, rnk
    """,
    doc=f"""Product quantization ANN (PQ + asymmetric distance): split
    the 64-dim vectors into {_PQ_M} x {_PQ_SUB}-dim subspaces, learn a
    {_PQ_K}-centroid codebook per subspace (one Lloyd iteration,
    deterministic first-{_PQ_K} init — the kmeans_embeddings doctrine
    per subspace), encode every vector as {_PQ_M} one-byte-able codes,
    and answer top-{_PQ_TOPK} queries by ADC shortlist + exact
    re-rank: approximate distance = Σ_subspace lookup(query-to-centroid
    table, candidate's code) selects {_PQ_SHORT} candidates, which are
    then re-scored with exact integer L2 (the FAISS refine step;
    deterministic recall@5 = 0.7 vs exhaustive L2 on the sf0.001
    fixture, pytest-checked) — the
    memory-bound trick behind FAISS-style billion-vector search (codes
    are {_PQ_M} small ints per vector instead of 64 floats; the
    query's {_PQ_M}x{_PQ_K} lookup table is computed once).  On the
    scaled integer grid every distance, assignment, codebook update,
    and ADC sum is exact BIGINT math, so the whole index AND the
    search results hash-match the oracle — a property float PQ cannot
    offer.  Plan (r13 packed-array form — see _pq_packed_views): the
    corpus is scanned as (vec, subspace, sub[{_PQ_SUB}]) array rows;
    codebooks ({_PQ_M * _PQ_K} array rows) broadcast into an in-row
    integer-L2 fold, argmin per (vec, subspace) is a hash-agg
    MIN(struct) — no exploded distance aggregate, no sort+window per
    assignment pass; ADC joins the broadcast
    {_PQ_NQ * _PQ_M * _PQ_K}-row query table against codes.  At 10^9
    vectors the codes table is the only big operand — which is the
    entire point of PQ.""",
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = spread(table(spark, sf_dir, "embeddings"))
    vecl, packed = _pq_packed_views(emb, sf_dir)
    seeds = (
        emb.select("vec_id")
        .orderBy("vec_id")
        .limit(_PQ_K)
        .select(
            "vec_id",
            # bounded input: LIMIT k rows, declared single partition
            (
                F.row_number().over(
                    Window.partitionBy(bounded_window_key("vec_id")).orderBy(
                        "vec_id"
                    )
                )
                - 1
            )
            .cast("bigint")
            .alias("cid"),
        )
    )
    cent0 = seeds.join(packed, "vec_id").select(
        "cid", "m", F.col("sub").alias("c")
    )

    # dist2 = exact integer L2 over one subspace, computed IN-ROW over
    # the packed sub-vector arrays (r13 rewrite): the dim-grain form
    # joined the 64x-exploded long view against K centroids per dim —
    # an n*64*K-row hash aggregate plus a (vec, m)-window per assignment
    # pass.  Packed, the join is (n*M rows) x K on the subspace id and
    # the sum over the _PQ_SUB dims is a zip_with/aggregate fold, so no
    # post-join aggregate exists at all and the argmin below is a
    # hash-agg MIN(struct), not a sort+window (guide §2.3/§2.4: 8x
    # fewer rows through the exchange, two Sorts and one Exchange per
    # pass removed; results proven row-identical vs the dim-grain form
    # and the unchanged oracle).
    _sub_dist2 = F.aggregate(
        F.zip_with("sub", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def assign(cent: DataFrame) -> DataFrame:
        return packed.join(F.broadcast(cent), "m").select(
            "vec_id", "m", "cid", _sub_dist2.alias("dist2")
        )

    # MIN(struct(dist2, cid)) == the row_number()=1 row under ORDER BY
    # (dist2, cid): struct comparison is lexicographic on the same key.
    _best = F.min(F.struct("dist2", "cid"))
    a1 = (
        assign(cent0)
        .groupBy("vec_id", "m")
        .agg(_best.alias("b"))
        .select("vec_id", "m", F.col("b.cid").alias("cid"))
    )
    # centroid update: per-position integer mean via _PQ_SUB parallel
    # SUM accumulators on the packed arrays (map-side combinable; no
    # explode, no per-dim shuffle), re-packed to an array for the next
    # broadcast.  SUM/COUNT/div identical to the dim-grain oracle.
    cent1 = (
        a1.join(packed, ["vec_id", "m"])
        .groupBy("cid", "m")
        .agg(
            *[
                F.expr(
                    f"CAST(SUM(element_at(sub, {i + 1})) AS BIGINT)"
                    " div COUNT(*)"
                ).alias(f"_c{i}")
                for i in range(_PQ_SUB)
            ]
        )
        .select(
            "cid",
            "m",
            F.array(*[F.col(f"_c{i}") for i in range(_PQ_SUB)]).alias("c"),
        )
    )
    # d2 feeds BOTH the code table and the query distance table: one
    # LAZY cut runs the second assignment pass once instead of twice
    # (r13 plan audit: zero exchange reuse between the two consumers).
    d2 = assign(cent1).localCheckpoint(eager=False)
    codes = (
        d2.groupBy("vec_id", "m")
        .agg(_best.alias("b"))
        .select("vec_id", "m", F.col("b.cid").alias("cid"))
    )
    qd = d2.where(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), "m", "cid", "dist2"
    )
    adc = (
        codes.join(F.broadcast(qd), ["m", "cid"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist2").alias("adc_dist2"))
    )
    wa = Window.partitionBy("query_id").orderBy("adc_dist2", "neighbor_id")
    shortlist = (
        adc.withColumn("arnk", F.row_number().over(wa))
        .where(F.col("arnk") <= _PQ_SHORT)
        .select("query_id", "neighbor_id", "adc_dist2")
    )
    # exact re-rank on WHOLE packed vectors: broadcast the (shortlist x
    # query-vector) table — Q*_PQ_SHORT rows — against the corpus vector
    # view and fold the 64-dim integer L2 in-row: one row per scored
    # pair instead of 64, and the grouped SUM disappears (same rewrite
    # rationale as the assignment passes; SUM order is irrelevant on
    # exact integers).
    qv = vecl.where(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("_qv")
    )
    exact = (
        vecl.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("_cv"))
        .join(F.broadcast(shortlist.join(qv, "query_id")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist2",
            F.aggregate(
                F.zip_with("_qv", "_cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        exact.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= _PQ_TOPK)
        .orderBy("query_id", "rnk")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
        WITH b AS (
            SELECT vec_id,
                   [CAST(x AS DOUBLE) FOR x IN embedding] AS v
            FROM embeddings
        ),
        rng AS (
            SELECT vec_id, v,
                   list_min(v) AS vmin, list_max(v) AS vmax
            FROM b
        ),
        q AS (
            SELECT vec_id, vmin, vmax,
                   [CAST(ROUND((x - vmin) * 255.0 / (vmax - vmin)) AS BIGINT)
                    FOR x IN v] AS codes
            FROM rng
            WHERE vmax > vmin
        )
        SELECT vec_id, vmin, vmax,
               CAST(list_sum(codes) AS BIGINT) AS code_sum,
               CAST(list_sum([c * c FOR c IN codes]) AS BIGINT)
                   AS code_sq_sum,
               CAST(list_min(codes) AS BIGINT) AS code_min,
               CAST(list_max(codes) AS BIGINT) AS code_max
        FROM q
        ORDER BY vec_id
    """,
    doc="""Int8 scalar quantization of embedding vectors — the 4x
    compression every serving/cache tier applies before ANN: per-vector
    affine map (v - min) * 255/(max - min) rounded to 0..255 codes.
    Entirely in-row higher-order functions: zero shuffle, zero Python —
    quantization is a map over the scan, exactly how it runs over
    100 TB of vectors.  Exactness: min/max/affine are IEEE ops on
    identical doubles, and the round lands on identical doubles in both
    engines (the scaled_long convention), so the integer codes — here
    audited via sum/sum-of-squares/min/max — hash-match.  Codes span
    the full 0..255 range by construction (min→0, max→255), which the
    code_min/code_max columns prove per row.""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    b = emb.select("vec_id", v.alias("v"))
    rng = b.select(
        "vec_id", "v", F.array_min("v").alias("vmin"), F.array_max("v").alias("vmax")
    ).where(F.col("vmax") > F.col("vmin"))
    codes = F.transform(
        "v",
        lambda x: F.round(
            (x - F.col("vmin")) * 255.0 / (F.col("vmax") - F.col("vmin"))
        ).cast("long"),
    )
    q = rng.select("vec_id", "vmin", "vmax", codes.alias("codes"))
    csum = F.aggregate(
        "codes", F.lit(0).cast("bigint"), lambda acc, c: acc + c
    )
    csq = F.aggregate(
        "codes", F.lit(0).cast("bigint"), lambda acc, c: acc + c * c
    )
    return q.select(
        "vec_id",
        "vmin",
        "vmax",
        csum.alias("code_sum"),
        csq.alias("code_sq_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
    ).orderBy("vec_id")


def _recall_branch(method: str) -> str:
    """Oracle fragment: per-query hits of `method` against exact top-K."""
    return f"""
        hits_{method} AS (
            SELECT e.query_id,
                   '{method}' AS method,
                   CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
            FROM exact e LEFT JOIN approx_{method} a
              ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
            GROUP BY e.query_id
        )
"""


@register(
    "ann_recall_audit",
    # The oracle composes the ALREADY-REGISTERED oracles of the exact
    # baseline and both ANN paths as CTEs, so it stays in lockstep with
    # them automatically: any change to those queries' semantics changes
    # this audit's oracle identically.
    oracle=f"""
        WITH exact AS ({{bf}}),
        approx_lsh AS ({{lsh}}),
        approx_ivf AS ({{ivf}}),
        {_recall_branch("lsh").strip()},
        {_recall_branch("ivf").strip()}
        SELECT query_id, method, CAST({K} AS BIGINT) AS k, n_hits,
               CAST(n_hits AS DOUBLE) / CAST({K} AS DOUBLE) AS recall_at_k
        FROM (SELECT * FROM hits_lsh UNION ALL SELECT * FROM hits_ivf)
        ORDER BY method, query_id
    """,
    doc=f"""ANN quality audit as a first-class query ("measure, don't
    guess" made queryable): recall@{K} of BOTH approximate
    nearest-neighbor paths (random-hyperplane LSH and IVF cell probing)
    against the exact brute-force top-{K}, per query vector and method.
    This is the acceptance gate a production vector pipeline runs after
    every re-index — a method whose recall drifts below its measured
    envelope (LSH ~0.65, IVF ~0.7 on these near-random fixtures;
    pytest floors at 0.5) means the index parameters no longer fit the
    data distribution.

    Implementation composes the three REGISTERED queries — exact,
    LSH, IVF — and left-joins approximate hits onto the exact top-K
    (count of non-null = hits).  The recall division is n/{K} with
    n <= {K}: one exact IEEE op.  The oracle nests the three queries'
    own registered oracle SQL as CTEs, so audit and audited can never
    drift apart.  Scale: the joins are on (query_id, neighbor_id) —
    Q x K rows per side, trivially broadcast; cost is dominated by the
    audited queries themselves (LSH/IVF indexes are memoized per
    (site, sf_dir), the build-once/serve-many production semantic).""",
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.registry import REGISTRY

    # the exact ground-truth table is joined against BOTH audited
    # methods: one LAZY cut runs the brute-force pass once instead of
    # twice (r13 plan audit: zero exchange reuse between the branches).
    exact = (
        REGISTRY["knn_cosine_bruteforce"]
        .fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    out = None
    for method in ("lsh", "ivf"):
        ap = (
            REGISTRY[f"knn_cosine_{method}"].fn(spark, sf_dir)
            .select(
                F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
            )
        )
        # both sides are Q x K rows (~hundreds), but the checkpointed
        # exact side and the windowed approx side have no size stats, so
        # the planner falls back to SortMergeJoin with an Exchange+Sort
        # on EACH side per method (r14 before-plan: 4 such exchanges).
        # An explicit broadcast of the approx side (guide §3.1) makes
        # each hits join a BroadcastHashJoin — the exact side is never
        # shuffled and the per-branch Exchange/Sort pairs disappear.
        j = exact.join(
            F.broadcast(ap),
            (F.col("query_id") == F.col("aq"))
            & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        hits = (
            j.groupBy("query_id")
            .agg(F.count("an").alias("n_hits"))
            .select(
                "query_id",
                F.lit(method).alias("method"),
                F.lit(K).cast("bigint").alias("k"),
                "n_hits",
                (
                    F.col("n_hits").cast("double")
                    / F.lit(K).cast("double")
                ).alias("recall_at_k"),
            )
        )
        out = hits if out is None else out.unionAll(hits)
    return out.orderBy("method", "query_id")


# Late-bind the composed oracle now that all three component queries are
# registered (REGISTRY holds frozen dataclasses; replace the entry).
import dataclasses as _dc  # noqa: E402

from kafka_hadoop_loader_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["ann_recall_audit"] = _dc.replace(
    _REG["ann_recall_audit"],
    oracle=_REG["ann_recall_audit"].oracle.format(
        bf=_REG["knn_cosine_bruteforce"].oracle,
        lsh=_REG["knn_cosine_lsh"].oracle,
        ivf=_REG["knn_cosine_ivf"].oracle,
    ),
)


_HN_K = 3


@register(
    "sample_hard_negatives",
    oracle=f"""
        WITH pairs AS (
            SELECT q.vec_id AS query_id, q.label AS query_label,
                   c.vec_id AS neighbor_id, c.label AS neighbor_label,
                   list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]) AS cos_sim
            FROM embeddings q JOIN embeddings c
              ON q.vec_id <> c.vec_id AND q.label <> c.label
            WHERE q.vec_id < {N_QUERIES}
        )
        SELECT query_id, query_label, neighbor_id, neighbor_label,
               cos_sim, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id)
                          AS rnk
            FROM pairs
        )
        WHERE rnk <= {_HN_K}
        ORDER BY query_id, rnk
    """,
    doc=f"""Hard-negative mining for contrastive training: for each
    anchor vector (the {N_QUERIES} query ids), the top-{_HN_K} most
    cosine-similar vectors with a DIFFERENT label — the near-miss
    negatives that make embedding models learn boundaries (random
    negatives are trivially easy; hard negatives carry the gradient).
    Same broadcast-anchors x candidates + window re-rank shape as
    knn_cosine_bruteforce with the label-disagreement predicate pushed
    into the join; cosine is the per-row sequential JVM fold, so the
    ranking is engine-exact.

    Scale: anchors are the bounded side (a training batch), broadcast
    against the corpus — one scan, no shuffle of the big side; at 10^9
    vectors swap the candidate generator for the IVF/LSH bucketed path
    (mine negatives within probed cells only), which is the standard
    ANCE-style approximate hard-negative pipeline.""",
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .where(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neighbor_label"))
        )
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= _HN_K)
        .orderBy("query_id", "rnk")
    )


_MAT_DIM = 16  # truncation prefix (matryoshka head) of the 64-dim vectors


@register(
    "ann_matryoshka_recall",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]) AS cos_full,
                   list_cosine_similarity(q.embedding[1:{_MAT_DIM}]::DOUBLE[],
                                          c.embedding[1:{_MAT_DIM}]::DOUBLE[])
                       AS cos_trunc
            FROM q JOIN embeddings c ON q.query_id <> c.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_full DESC, neighbor_id)
                       AS rnk_full,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos_trunc DESC, neighbor_id)
                       AS rnk_trunc
            FROM scored
        )
        SELECT f.query_id AS query_id,
               CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
               CAST(COUNT(t.neighbor_id) AS DOUBLE) / {K}.0 AS recall_at_k
        FROM (SELECT * FROM ranked WHERE rnk_full <= {K}) f
        LEFT JOIN (SELECT * FROM ranked WHERE rnk_trunc <= {K}) t
          ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
        GROUP BY f.query_id
        ORDER BY query_id
    """,
    doc=f"""Matryoshka-truncation recall audit: score the first
    {N_QUERIES} queries against all candidates with BOTH the full
    64-dim cosine and the {_MAT_DIM}-dim prefix cosine in ONE pass,
    rank each (two windows over the same partitioning — one exchange),
    and report per-query recall@{K} of the truncated ranking against
    the exact one.  This is the evaluation behind Matryoshka-style
    embedding deployment: serve the cheap prefix, keep the measured
    recall cost on a dashboard.  Same audit contract as
    ann_recall_audit — the exact ranking is computed in-query, so the
    verdict cannot drift from the audited index.

    Determinism: both cosines are the per-row sequential fold that
    already hash-matches DuckDB's list_cosine_similarity; ranks
    tie-break on neighbor_id; recall is one exact division by {K}.

    Scale: candidate scoring is the broadcast-queries pattern (bounded
    by the query batch); the prefix slice costs nothing extra because
    both scores ride the same candidate pass.  At 10^9 vectors swap
    the exact arm for knn_cosine_ivf and keep the same overlap join.""",
)
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    qh = F.slice(F.col("q_emb"), 1, _MAT_DIM)
    ch = F.slice(F.col("c_emb"), 1, _MAT_DIM)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_full"),
            cosine(qh, ch).alias("cos_trunc"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id")
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("cos_trunc").desc(), F.col("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wf).alias("rnk_full"),
        F.row_number().over(wt).alias("rnk_trunc"),
    )
    full_top = ranked.where(F.col("rnk_full") <= K).select("query_id", "neighbor_id")
    trunc_top = ranked.where(F.col("rnk_trunc") <= K).select(
        F.col("query_id").alias("t_query_id"),
        F.col("neighbor_id").alias("t_neighbor_id"),
    )
    return (
        full_top.join(
            trunc_top,
            (F.col("query_id") == F.col("t_query_id"))
            & (F.col("neighbor_id") == F.col("t_neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("t_neighbor_id").alias("n_overlap"),
            (F.count("t_neighbor_id").cast("double") / float(K)).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )


# --- IVF build frontier: cost vs recall across probe depths -------------

_FRONTIER_NPROBES = (1, 2, 3, 5)
_FRONTIER_MAXP = max(_FRONTIER_NPROBES)


@register(
    "ann_ivf_probe_frontier",
    # Oracle composed from the SHARED assignment fragment
    # (_IVF_ASSIGN_SQL — the same CTE chain knn_cosine_ivf replays) and
    # the already-registered brute-force oracle, so the frontier stays
    # in lockstep with both the index it measures and the ground truth
    # it scores against ({bf} is late-bound below).
    oracle=f"""
        WITH {_IVF_ASSIGN_SQL.strip()},
        fhome AS (
            SELECT vec_id AS neighbor_id, embedding AS c_emb,
                   nrm AS c_nrm, cell
            FROM ranked WHERE rk = 1
        ),
        fprobes AS (
            SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
                   cell, rk AS probe_rk
            FROM ranked WHERE rk <= {_FRONTIER_MAXP} AND vec_id < {N_QUERIES}
        ),
        fcand AS (
            SELECT p.query_id, h.neighbor_id, p.probe_rk,
                   {_FOLD_DOT.format(a="p.q_emb", b="h.c_emb")}
                       / (p.q_nrm * h.c_nrm) AS cos_sim
            FROM fprobes p JOIN fhome h USING (cell)
            WHERE p.query_id <> h.neighbor_id
        ),
        nps(nprobe) AS (VALUES {", ".join(f"({n})" for n in _FRONTIER_NPROBES)}),
        sel AS (
            SELECT n.nprobe, c.query_id, c.neighbor_id, c.cos_sim
            FROM fcand c JOIN nps n ON c.probe_rk <= n.nprobe
        ),
        topk AS (
            SELECT nprobe, query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY nprobe, query_id
                           ORDER BY cos_sim DESC, neighbor_id) AS rnk
                FROM sel
            ) WHERE rnk <= {K}
        ),
        exact AS ({{bf}}),
        hits AS (
            SELECT t.nprobe, CAST(COUNT(e.neighbor_id) AS BIGINT) AS total_hits
            FROM topk t LEFT JOIN exact e
              ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
            GROUP BY t.nprobe
        ),
        scanned AS (
            SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS scanned_rows
            FROM sel GROUP BY nprobe
        ),
        nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vec FROM embeddings)
        SELECT s.nprobe, s.scanned_rows,
               CAST(s.scanned_rows AS DOUBLE)
                   / (CAST({N_QUERIES} AS DOUBLE) * CAST(nv.n_vec AS DOUBLE))
                   AS scanned_frac,
               COALESCE(h.total_hits, CAST(0 AS BIGINT)) AS total_hits,
               CAST(COALESCE(h.total_hits, CAST(0 AS BIGINT)) AS DOUBLE)
                   / CAST({K * N_QUERIES} AS DOUBLE) AS recall_at_k
        FROM scanned s LEFT JOIN hits h ON s.nprobe = h.nprobe CROSS JOIN nv
        ORDER BY s.nprobe
    """,
    doc=f"""IVF index-tuning frontier: recall@{K} versus fraction of the
    corpus scanned, at probe depths nprobe = {_FRONTIER_NPROBES} — the
    cost/recall curve an ANN deployment reads to pick its operating
    point (the FAISS-style "probe more cells, scan more lists, recall
    rises" trade made queryable, next to ann_recall_audit's
    fixed-parameter acceptance gate).

    One candidate pass serves every probe depth: candidates are
    generated ONCE at the maximum nprobe with the probe rank that
    produced each (query, neighbor) pair (a neighbor lives in exactly
    one home cell, so the pair's probe_rk is unique), then each depth
    is a filter probe_rk <= nprobe over the same exchange — the
    matryoshka-recall trick applied to index tuning.  Recall is scored
    against the registered brute-force top-{K}; the oracle nests the
    shared assignment fragment and the brute-force oracle as CTEs, so
    the frontier can never drift from the index or the ground truth.

    Scale: reuses knn_cosine_ivf's memoized assignment (build once,
    serve many); the per-depth work is a broadcast of {N_QUERIES}
    queries' probe lists against cell-bucketed posting lists — never
    all-pairs — and the final aggregate is {len(_FRONTIER_NPROBES)}
    rows.  At 10^9 vectors the same query runs on a sampled query set
    and the conclusion (the knee of the curve) transfers.""",
)
def ann_ivf_probe_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    assign = _ivf_assign(spark, sf_dir)
    home = assign.where(F.col("rk") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        "cell",
    )
    probes = assign.where(
        (F.col("rk") <= _FRONTIER_MAXP) & (F.col("vec_id") < N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "cell",
        F.col("rk").alias("probe_rk"),
    )
    pair_cos = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    cand = (
        probes.join(home, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "probe_rk", pair_cos.alias("cos_sim"))
        # read twice below (topk + scanned); the probe/home exchanges are
        # memoized via _ivf_assign and reused, and a lazy localCheckpoint
        # here would cost a build-time job (no-action-at-construction)
    )
    nps = spark.createDataFrame(
        [(n,) for n in _FRONTIER_NPROBES], "nprobe int"
    )
    sel = cand.crossJoin(F.broadcast(nps)).where(
        F.col("probe_rk") <= F.col("nprobe")
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    topk = (
        sel.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .select("nprobe", "query_id", "neighbor_id")
    )
    exact = (
        _REG["knn_cosine_bruteforce"]
        .fn(spark, sf_dir)
        .select(
            F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en")
        )
    )
    hits = (
        # exact is the bounded Q x K ground-truth table; broadcast it so
        # the per-nprobe topk side never shuffles (same stats-free SMJ
        # fallback as the recall audits' hits joins — guide §3.1)
        topk.join(
            F.broadcast(exact),
            (F.col("query_id") == F.col("eq"))
            & (F.col("neighbor_id") == F.col("en")),
            "left",
        )
        .groupBy("nprobe")
        .agg(F.count("en").cast("bigint").alias("total_hits"))
    )
    scanned = sel.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("scanned_rows")
    )
    nv = spread(table(spark, sf_dir, "embeddings"), "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vec")
    )
    zero = F.lit(0).cast("bigint")
    return (
        scanned.join(F.broadcast(hits), "nprobe", "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "nprobe",
            "scanned_rows",
            (
                F.col("scanned_rows").cast("double")
                / (
                    F.lit(float(N_QUERIES))
                    * F.col("n_vec").cast("double")
                )
            ).alias("scanned_frac"),
            F.coalesce(F.col("total_hits"), zero).alias("total_hits"),
            (
                F.coalesce(F.col("total_hits"), zero).cast("double")
                / F.lit(float(K * N_QUERIES))
            ).alias("recall_at_k"),
        )
        .orderBy("nprobe")
    )


_REG["ann_ivf_probe_frontier"] = _dc.replace(
    _REG["ann_ivf_probe_frontier"],
    oracle=_REG["ann_ivf_probe_frontier"].oracle.format(
        bf=_REG["knn_cosine_bruteforce"].oracle
    ),
)


@register(
    "ann_pq_recall_audit",
    # Late-bound below: {pq} is replaced by knn_pq_adc's registered
    # oracle, so the audit re-runs the audited index verbatim — the
    # same compose-the-oracles lockstep as ann_recall_audit.
    oracle=f"""
        WITH approx_pq AS ({{pq}}),
        lv2 AS (
            SELECT vec_id, i AS dim,
                   CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_PQ_SCALE})
                        AS BIGINT) + {_PQ_OFFSET} AS v
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        truth_d AS (
            SELECT ql.vec_id AS query_id, cl.vec_id AS neighbor_id,
                   CAST(SUM((ql.v - cl.v) * (ql.v - cl.v)) AS BIGINT)
                       AS dist2
            FROM lv2 ql JOIN lv2 cl
              ON cl.dim = ql.dim AND cl.vec_id <> ql.vec_id
            WHERE ql.vec_id < {_PQ_NQ}
            GROUP BY 1, 2
        ),
        truth AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY dist2, neighbor_id)
                           AS rnk
                FROM truth_d
            ) WHERE rnk <= {_PQ_TOPK}
        ),
        hits AS (
            SELECT t.query_id,
                   CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
            FROM truth t LEFT JOIN approx_pq a
              ON a.query_id = t.query_id
             AND a.neighbor_id = t.neighbor_id
            GROUP BY t.query_id
        )
        SELECT query_id, CAST({_PQ_TOPK} AS BIGINT) AS k, n_hits,
               CAST(n_hits AS DOUBLE) / CAST({_PQ_TOPK} AS DOUBLE)
                   AS recall_at_k,
               n_hits * 2 >= {_PQ_TOPK} AS meets_floor
        FROM hits
        ORDER BY query_id
    """,
    doc=f"""Recall@{_PQ_TOPK} acceptance audit for the PQ/ADC index —
    closes the audit gap in the ANN tier table: ann_recall_audit
    covers LSH and IVF (cosine family) but knn_pq_adc answers integer
    L2 queries, so its ground truth is the exhaustive L2 top-{_PQ_TOPK}
    on the SAME scaled grid ({_PQ_SCALE}x + {_PQ_OFFSET} offset),
    recomputed here per query and left-joined against the index's
    answers.  Per query: hit count, recall, and an exact
    cross-multiplied >=50% floor verdict (the measured envelope on
    these near-random fixtures is ~0.7; below 0.5 the codebook no
    longer fits the data).

    The oracle nests knn_pq_adc's full registered oracle as a CTE
    (late-bound at import), so audit and audited cannot drift; the
    ground-truth arm shares the managed-persist packed-vector view
    with the index build (build once, audit free) and scores corpus x
    broadcast-queries at vector grain with an in-row integer-L2 fold
    (r13: n*Q rows instead of the dim-grain n*64*Q hash aggregate).

    Scale: ground truth is the documented broadcast-bounded-query-
    batch shape ({_PQ_NQ} queries x corpus, the same class as
    knn_cosine_bruteforce); the audit join itself is Q x {_PQ_TOPK}
    rows per side.  At 10^9 vectors swap the exact arm for a larger
    shortlist re-rank exactly as the ann_recall_audit doctrine
    documents.""",
)
def ann_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kafka_hadoop_loader_spark.registry import REGISTRY

    pq = (
        REGISTRY["knn_pq_adc"]
        .fn(spark, sf_dir)
        .select(
            F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
        )
    )
    emb = spread(table(spark, sf_dir, "embeddings"))
    # ground truth on the WHOLE packed vectors (shared managed-persist
    # view with the audited index): corpus x broadcast-queries at
    # VECTOR grain with an in-row integer-L2 fold — n*Q rows total
    # instead of the dim-grain join's n*64*Q rows through a hash
    # aggregate (r13 rewrite; same scaled-BIGINT math as the oracle's
    # lv2 CTE, results proven hash-identical).
    vecl, _ = _pq_packed_views(emb, sf_dir)
    q = vecl.where(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("_qv")
    )
    truth_d = (
        vecl.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("v", "_qv", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    truth = (
        truth_d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _PQ_TOPK)
        .select("query_id", "neighbor_id")
    )
    hits = (
        # same shape as ann_recall_audit's hits join: both sides are
        # Q x K rows but stats-free, so the planner falls back to a
        # SortMergeJoin with an Exchange+Sort per side; broadcasting
        # the audited side (guide §3.1) keeps the truth side unshuffled
        # (measured A/B in OPTIMIZATION_r14.md wave 2).
        truth.join(
            F.broadcast(pq),
            (F.col("query_id") == F.col("aq"))
            & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("an").cast("bigint").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(_PQ_TOPK).cast("bigint").alias("k"),
        "n_hits",
        (
            F.col("n_hits").cast("double")
            / F.lit(_PQ_TOPK).cast("double")
        ).alias("recall_at_k"),
        (F.col("n_hits") * 2 >= F.lit(_PQ_TOPK)).alias("meets_floor"),
    ).orderBy("query_id")


_REG["ann_pq_recall_audit"] = _dc.replace(
    _REG["ann_pq_recall_audit"],
    oracle=_REG["ann_pq_recall_audit"].oracle.format(
        pq=_REG["knn_pq_adc"].oracle
    ),
)


@register(
    "ml_knn_label_eval",
    # {bf} late-bound below to knn_cosine_bruteforce's registered
    # oracle — the classifier is evaluated on the EXACT neighbor table
    # the index tier ships.
    oracle=f"""
        WITH nn AS ({{bf}}),
        votes AS (
            SELECT query_id, neighbor_label,
                   CAST(COUNT(*) AS BIGINT) AS n_votes,
                   CAST(MIN(rnk) AS BIGINT) AS best_rnk
            FROM nn GROUP BY 1, 2
        ),
        pred AS (
            SELECT query_id, neighbor_label AS predicted_label, n_votes
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY n_votes DESC, best_rnk, neighbor_label) AS r
                FROM votes
            ) WHERE r = 1
        )
        SELECT p.query_id,
               CAST(e.label AS BIGINT) AS true_label,
               CAST(p.predicted_label AS BIGINT) AS predicted_label,
               p.n_votes,
               CAST({K} AS BIGINT) AS k,
               p.predicted_label = e.label AS correct
        FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
        ORDER BY p.query_id
    """,
    doc=f"""Leave-one-out k-NN label evaluation — the standard intrinsic
    quality check for an embedding space (if labels aren't recoverable
    from neighborhoods, the embeddings aren't carrying them): for each
    of the {N_QUERIES} audit queries, the exact top-{K} cosine
    neighbor table votes on the query's label (majority; ties broken
    by best rank, then label), and the prediction is scored against
    the query's own stored label.  Per query: truth, prediction, vote
    count, verdict — the table an embedding-training run charts per
    checkpoint.

    Determinism: composes knn_cosine_bruteforce's already-hash-matched
    neighbor table (the oracle nests its registered oracle); the vote
    is pure integer counting with a three-key deterministic
    tie-break.

    Scale: everything after the neighbor table is O(queries x labels);
    the neighbor table itself is the audited tier's cost, and swapping
    the exact arm for the LSH/IVF form evaluates the production index
    instead — the compose-the-oracles doctrine of ann_recall_audit.""",
)
def ml_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.registry import REGISTRY

    nn = REGISTRY["knn_cosine_bruteforce"].fn(spark, sf_dir)
    votes = nn.groupBy("query_id", "neighbor_label").agg(
        F.count("*").cast("bigint").alias("n_votes"),
        F.min("rnk").cast("bigint").alias("best_rnk"),
    )
    # vote argmax by (votes desc, best_rnk asc, label asc) as
    # MAX(struct(votes, -best_rnk, -label)) — map-side combinable, no
    # Sort+Window over the votes table (r13; results row-identical,
    # interleaved min-of-3 1.26s -> 1.18s).
    pred = (
        votes.groupBy("query_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_votes"),
                    (-F.col("best_rnk")).alias("nbr"),
                    (-F.col("neighbor_label")).alias("nlb"),
                )
            ).alias("b")
        )
        .select(
            "query_id",
            (-F.col("b.nlb")).alias("predicted_label"),
            F.col("b.n_votes").alias("n_votes"),
        )
    )
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(emb, "query_id")
        .select(
            "query_id",
            F.col("true_label").cast("bigint").alias("true_label"),
            F.col("predicted_label").cast("bigint").alias("predicted_label"),
            "n_votes",
            F.lit(K).cast("bigint").alias("k"),
            (F.col("predicted_label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


_REG["ml_knn_label_eval"] = _dc.replace(
    _REG["ml_knn_label_eval"],
    oracle=_REG["ml_knn_label_eval"].oracle.format(
        bf=_REG["knn_cosine_bruteforce"].oracle
    ),
)


# --- Confusion matrix of the kNN label classifier ---------------------------


@register(
    "ml_confusion_matrix",
    # {knn} late-bound below to ml_knn_label_eval's registered oracle.
    oracle="""
        WITH pred AS ({knn}),
        labels AS (
            SELECT true_label AS label FROM pred
            UNION
            SELECT predicted_label AS label FROM pred
        )
        SELECT l.label,
               CAST((SELECT COUNT(*) FROM pred p
                     WHERE p.true_label = l.label) AS BIGINT) AS n_true,
               CAST((SELECT COUNT(*) FROM pred p
                     WHERE p.predicted_label = l.label) AS BIGINT) AS n_pred,
               CAST((SELECT COUNT(*) FROM pred p
                     WHERE p.true_label = l.label
                       AND p.predicted_label = l.label) AS BIGINT) AS tp,
               CAST((SELECT COUNT(*) FROM pred p
                     WHERE p.true_label = l.label
                       AND p.predicted_label = l.label) AS DOUBLE)
                   / CAST(NULLIF((SELECT COUNT(*) FROM pred p
                                  WHERE p.predicted_label = l.label), 0)
                          AS DOUBLE) AS precision,
               CAST((SELECT COUNT(*) FROM pred p
                     WHERE p.true_label = l.label
                       AND p.predicted_label = l.label) AS DOUBLE)
                   / CAST(NULLIF((SELECT COUNT(*) FROM pred p
                                  WHERE p.true_label = l.label), 0)
                          AS DOUBLE) AS recall,
               CAST(2 * (SELECT COUNT(*) FROM pred p
                         WHERE p.true_label = l.label
                           AND p.predicted_label = l.label) AS DOUBLE)
                   / CAST(NULLIF((SELECT COUNT(*) FROM pred p
                                  WHERE p.true_label = l.label)
                                 + (SELECT COUNT(*) FROM pred p
                                    WHERE p.predicted_label = l.label), 0)
                          AS DOUBLE) AS f1
        FROM labels l
        ORDER BY l.label
    """,
    doc="""Per-class confusion summary of the k-NN label classifier —
    the next table after ml_knn_label_eval's per-query verdicts: for
    every label observed as truth or prediction, the support, the
    prediction count, true positives, and precision/recall/F1, each a
    SINGLE exact division (F1 in its one-division form
    2tp/(n_true+n_pred), never the P*R composition that would chain
    float ops).  NULLIF guards classes never predicted / never true.

    The oracle nests ml_knn_label_eval's registered oracle (itself
    nesting the exact neighbor table) — three compose levels, still
    drift-proof.

    Scale: O(queries) input, O(|labels|) output; everything heavy
    happened in the audited neighbor tier.""",
)
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.registry import REGISTRY

    pred = REGISTRY["ml_knn_label_eval"].fn(spark, sf_dir).select(
        "true_label", "predicted_label"
    )
    from kafka_hadoop_loader_spark.catalog import managed_persist

    pred = managed_persist(f"ml_confusion_matrix:pred:{sf_dir}", pred)
    labels = (
        pred.select(F.col("true_label").alias("label"))
        .union(pred.select(F.col("predicted_label").alias("label")))
        .distinct()
    )
    per_true = pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_true"),
        F.count(F.when(F.col("true_label") == F.col("predicted_label"), 1))
        .cast("bigint")
        .alias("tp"),
    )
    per_pred = pred.groupBy(F.col("predicted_label").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_pred")
    )
    z = F.lit(0).cast("bigint")
    return (
        labels.join(per_true, "label", "left")
        .join(per_pred, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", z).alias("n_true"),
            F.coalesce("n_pred", z).alias("n_pred"),
            F.coalesce("tp", z).alias("tp"),
            (
                F.coalesce("tp", z).cast("double")
                / F.nullif(F.coalesce("n_pred", z), F.lit(0)).cast("double")
            ).alias("precision"),
            (
                F.coalesce("tp", z).cast("double")
                / F.nullif(F.coalesce("n_true", z), F.lit(0)).cast("double")
            ).alias("recall"),
            (
                (2 * F.coalesce("tp", z)).cast("double")
                / F.nullif(
                    F.coalesce("n_true", z) + F.coalesce("n_pred", z),
                    F.lit(0),
                ).cast("double")
            ).alias("f1"),
        )
        .orderBy("label")
    )


_REG["ml_confusion_matrix"] = _dc.replace(
    _REG["ml_confusion_matrix"],
    oracle=_REG["ml_confusion_matrix"].oracle.format(
        knn=_REG["ml_knn_label_eval"].oracle
    ),
)
