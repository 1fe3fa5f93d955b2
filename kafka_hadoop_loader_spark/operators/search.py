"""Full-text search primitives over the documents table: inverted
index construction, conjunctive keyword search with TF-IDF ranking,
and skip-gram PMI co-occurrence mining.

These are the retrieval-side operators of a training-data pipeline
(the read-path dual of text_tfidf/text_token_freq): build the
term → postings index once, serve AND-queries from it, and mine
collocations for tokenizer/phrase analysis.  Tokenization matches
textstats.py exactly: whitespace split, no normalization (the
normalization pass is its own operator, text_normalize).

Determinism: postings are sorted doc-id prefixes; ranking scores are
RATIONAL statistics (linear idf, association lift) built from exact
integer counts with fixed association order — ln() never appears in an
oracle-checked output (not correctly rounded across libms, per the
textstats.py doctrine; +,-,*,/ and sqrt are, per IEEE 754); every
LIMIT rides on a total order with explicit tie-break keys.

Scale: the index build is one explode + two hash aggregates — the
classic distributed indexing job; queries touch only the postings of
the query terms (broadcast-joined document-frequency table).  PMI
pair generation is IN-ROW via positional slicing (no self-join, no
shuffle of the exploded stream beyond the final pair aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import managed_persist, spread, table
from kafka_hadoop_loader_spark.plans.ranking import bounded_window_key
from kafka_hadoop_loader_spark.registry import register

# Conjunctive query for keyword_search: mid-frequency DB-themed terms
# present in the fixture vocabulary at every SF.
_QUERY_TERMS = ("hash", "join", "scan")


@register(
    "inverted_index",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        posting AS (
            SELECT term,
                   CAST(COUNT(*) AS BIGINT) AS tf_total,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                   array_to_string(list_sort(list(DISTINCT doc_id))[1:10], ',')
                       AS postings_head
            FROM toks GROUP BY term
        )
        SELECT term, tf_total, df, postings_head
        FROM posting
        WHERE df >= 5
        ORDER BY df DESC, term
        LIMIT 100
    """,
    doc="""Inverted-index build: term → (total term frequency, document
    frequency, head of the sorted postings list).  The postings head is
    the first 10 doc ids — bounded output width regardless of term
    popularity; a real index write would keep the full sorted list as
    an array column partitioned by term-hash.

    Scale: explode + one hash aggregate per term with map-side combine;
    collect_set stays bounded because the projection slices to 10 after
    sorting.  df >= 5 prunes the hapax tail before the ordered limit.
    The LIMIT rides on (df DESC, term) — a total order.""",
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("tf_total"),
            F.countDistinct("doc_id").alias("df"),
            F.concat_ws(
                ",", F.slice(F.sort_array(F.collect_set("doc_id")), 1, 10)
            ).alias("postings_head"),
        )
        .where(F.col("df") >= 5)
        .orderBy(F.col("df").desc(), "term")
        .limit(100)
    )


@register(
    "keyword_search",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks
            WHERE term IN ('{_QUERY_TERMS[0]}', '{_QUERY_TERMS[1]}', '{_QUERY_TERMS[2]}')
            GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
        ),
        piv AS (
            SELECT t.doc_id,
                   CAST(SUM(CASE WHEN t.term = 'hash' THEN t.tf END) AS BIGINT) AS tf1,
                   CAST(SUM(CASE WHEN t.term = 'join' THEN t.tf END) AS BIGINT) AS tf2,
                   CAST(SUM(CASE WHEN t.term = 'scan' THEN t.tf END) AS BIGINT) AS tf3,
                   CAST(MAX(CASE WHEN t.term = 'hash' THEN d.df END) AS BIGINT) AS df1,
                   CAST(MAX(CASE WHEN t.term = 'join' THEN d.df END) AS BIGINT) AS df2,
                   CAST(MAX(CASE WHEN t.term = 'scan' THEN d.df END) AS BIGINT) AS df3
            FROM tf t JOIN df d ON t.term = d.term
            GROUP BY t.doc_id
        )
        SELECT p.doc_id AS doc_id,
               p.tf1 + p.tf2 + p.tf3 AS total_tf,
               CAST(p.tf1 AS DOUBLE) * (CAST(nd.n_docs AS DOUBLE) / CAST(p.df1 AS DOUBLE))
               + CAST(p.tf2 AS DOUBLE) * (CAST(nd.n_docs AS DOUBLE) / CAST(p.df2 AS DOUBLE))
               + CAST(p.tf3 AS DOUBLE) * (CAST(nd.n_docs AS DOUBLE) / CAST(p.df3 AS DOUBLE))
                   AS score
        FROM piv p CROSS JOIN nd
        WHERE p.tf1 IS NOT NULL AND p.tf2 IS NOT NULL AND p.tf3 IS NOT NULL
        ORDER BY total_tf DESC, doc_id
        LIMIT 20
    """,
    doc="""Conjunctive keyword search: documents containing ALL query
    terms {hash, join, scan}, ranked by total term frequency with a
    linear-idf relevance score (tf · N/df summed over the query terms
    in fixed association order — the ln-idf variant is monotone in the
    same per-term ratio but ln() is not bit-portable across libms, per
    the textstats.py doctrine, so the score stays rational).

    Determinism: the per-term tf/df are pivoted to fixed columns
    first, so the score is a FIXED-ASSOCIATION sum of three exact
    products — no aggregate-order float drift is possible — and the
    LIMIT rides on (total_tf DESC, doc_id), exact integers.

    Scale: the scan touches only postings of the query terms (the
    WHERE prunes before the first aggregate); df is a 3-row broadcast;
    the conjunctive gate is HAVING COUNT(DISTINCT term) = |query| —
    the standard AND-of-postings merge as one aggregate.""",
)
def keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (
        toks.where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    t1, t2, t3 = _QUERY_TERMS
    piv = (
        tf.join(F.broadcast(df), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(f"CASE WHEN term = '{t1}' THEN tf END")).alias("tf1"),
            F.sum(F.expr(f"CASE WHEN term = '{t2}' THEN tf END")).alias("tf2"),
            F.sum(F.expr(f"CASE WHEN term = '{t3}' THEN tf END")).alias("tf3"),
            F.max(F.expr(f"CASE WHEN term = '{t1}' THEN df END")).alias("df1"),
            F.max(F.expr(f"CASE WHEN term = '{t2}' THEN df END")).alias("df2"),
            F.max(F.expr(f"CASE WHEN term = '{t3}' THEN df END")).alias("df3"),
        )
    )
    score = (
        "CAST(tf1 AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df1 AS DOUBLE))"
        " + CAST(tf2 AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df2 AS DOUBLE))"
        " + CAST(tf3 AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df3 AS DOUBLE))"
    )
    return (
        piv.where(
            F.col("tf1").isNotNull()
            & F.col("tf2").isNotNull()
            & F.col("tf3").isNotNull()
        )
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            (F.col("tf1") + F.col("tf2") + F.col("tf3")).alias("total_tf"),
            F.expr(score).alias("score"),
        )
        .orderBy(F.col("total_tf").desc(), "doc_id")
        .limit(20)
    )


@register(
    "cooccur_pmi",
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        prs AS (
            SELECT CASE WHEN ws[i] < ws[i + 1] THEN ws[i] ELSE ws[i + 1] END AS tok_a,
                   CASE WHEN ws[i] < ws[i + 1] THEN ws[i + 1] ELSE ws[i] END AS tok_b
            FROM w, unnest(generate_series(1, len(ws) - 1)) AS u(i)
            WHERE len(ws) >= 2
            UNION ALL
            SELECT CASE WHEN ws[i] < ws[i + 2] THEN ws[i] ELSE ws[i + 2] END AS tok_a,
                   CASE WHEN ws[i] < ws[i + 2] THEN ws[i + 2] ELSE ws[i] END AS tok_b
            FROM w, unnest(generate_series(1, len(ws) - 2)) AS u(i)
            WHERE len(ws) >= 3
        ),
        pc AS (
            SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM prs GROUP BY tok_a, tok_b
        ),
        tc AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok FROM (
                SELECT unnest(string_split(text, ' ')) AS tok FROM documents
            ) GROUP BY tok
        ),
        tot AS (
            SELECT CAST(SUM(n_ab) AS BIGINT) AS n_pairs,
                   (SELECT CAST(SUM(n_tok) AS BIGINT) FROM tc) AS n_toks
            FROM pc
        )
        SELECT p.tok_a AS tok_a, p.tok_b AS tok_b, p.n_ab AS n_ab,
               (CAST(p.n_ab AS DOUBLE) * CAST(t.n_toks AS DOUBLE) * CAST(t.n_toks AS DOUBLE))
                  / (CAST(t.n_pairs AS DOUBLE) * CAST(a.n_tok AS DOUBLE) * CAST(b.n_tok AS DOUBLE))
                   AS lift
        FROM pc p
        JOIN tc a ON a.tok = p.tok_a
        JOIN tc b ON b.tok = p.tok_b
        CROSS JOIN tot t
        WHERE p.n_ab >= 10
        ORDER BY n_ab DESC, tok_a, tok_b
        LIMIT 50
    """,
    doc="""Skip-gram PMI collocation mining: unordered token pairs
    within distance ≤ 2, scored by association lift
    P(a,b) / (P(a)·P(b)) — the exponential of PMI, monotone-equivalent
    and bit-portable (products and divisions of exact integer casts are
    correctly rounded IEEE ops; ln() is not, per the textstats.py
    doctrine) — with P(a,b) over the pair total and P(·) over the
    token total.  This is the phrase/collocation detector
    a tokenizer-training pipeline runs before BPE merges
    (text_token_count_bpe's sibling).

    Pair generation is IN-ROW — positional slicing of the token array
    (transform over an index sequence), not a positional self-join —
    so the only shuffles are the final hash aggregates.  Pair
    canonicalization (lexicographic min/max) makes the pair unordered
    on both engines.  PMI is doubles from five exact integers with
    identical expression text; the LIMIT rides on (n_ab DESC, tok_a,
    tok_b) — a total order on exact values.""",
)
def cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    w = F.split("text", " ")

    def skip_pairs(dist: int):
        # slice+arrays_zip: the split evaluates once per row, not once
        # per element inside the lambda (the _shingle_hashes 7x trap;
        # r13 wave 12, pairs proven identical at sf0.001/sf0.01).
        n = F.size(w)
        z = F.arrays_zip(
            F.slice(w, 1, n - dist), F.slice(w, F.lit(1 + dist), n - dist)
        )
        return F.transform(
            z,
            lambda s: F.struct(
                F.least(s["0"], s["1"]).alias("tok_a"),
                F.greatest(s["0"], s["1"]).alias("tok_b"),
            ),
        )

    prs = (
        d.where(F.size(w) >= 2)
        .select(F.explode(skip_pairs(1)).alias("pr"))
        .unionAll(
            d.where(F.size(w) >= 3).select(F.explode(skip_pairs(2)).alias("pr"))
        )
        .select("pr.tok_a", "pr.tok_b")
    )
    # persisted: the pair-count table feeds BOTH the global total row
    # and the scored join — without it the explode + aggregate (the
    # expensive pass) runs twice.
    pc = managed_persist(
        f"cooccur_pmi:pair_counts:{sf_dir}",
        prs.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_ab")),
    )
    tc = (
        d.select(F.explode(w).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
    )
    tot = pc.agg(F.sum("n_ab").alias("n_pairs")).join(
        tc.agg(F.sum("n_tok").alias("n_toks"))
    )
    a = tc.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("na"))
    b = tc.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("nb"))
    return (
        pc.where(F.col("n_ab") >= 10)
        .join(F.broadcast(a), "tok_a")
        .join(F.broadcast(b), "tok_b")
        .join(F.broadcast(tot))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.expr(
                "(CAST(n_ab AS DOUBLE) * CAST(n_toks AS DOUBLE) * CAST(n_toks AS DOUBLE))"
                " / (CAST(n_pairs AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "tok_a", "tok_b")
        .limit(50)
    )


_SC_DF_DIV = 8  # rare-term cap = n_docs/8 (scales with corpus)
_SC_TOPK = 20


@register(
    "doc_sparse_cosine",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY term
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        w AS (
            SELECT t.doc_id, t.term,
                   t.tf * ((SELECT n_docs FROM n) - d.df + 1) AS wt
            FROM tf t JOIN df d USING (term)
            WHERE d.df <= (SELECT n_docs FROM n) // {_SC_DF_DIV}
        ),
        norms AS (
            SELECT doc_id, CAST(SUM(wt * wt) AS BIGINT) AS ss
            FROM w GROUP BY doc_id
        ),
        dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(SUM(a.wt * b.wt) AS BIGINT) AS dot,
                   CAST(COUNT(*) AS BIGINT) AS n_shared_terms
            FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY doc_a, doc_b
        )
        SELECT doc_a, doc_b, n_shared_terms,
               CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE)))
                   AS cos_sim,
               CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                       ORDER BY CAST(dot AS DOUBLE)
                                / (sqrt(CAST(na0.ss AS DOUBLE))
                                   * sqrt(CAST(nb0.ss AS DOUBLE))) DESC,
                                doc_a, doc_b) AS rnk
            FROM dots d0
            JOIN norms na0 ON na0.doc_id = d0.doc_a
            JOIN norms nb0 ON nb0.doc_id = d0.doc_b
        ) d
        JOIN norms na ON na.doc_id = d.doc_a
        JOIN norms nb ON nb.doc_id = d.doc_b
        WHERE rnk <= {_SC_TOPK}
        ORDER BY rnk
    """,
    doc=f"""Sparse vector-space document similarity: TF x linear-IDF
    weights (rational — ln() is not bit-portable, N-df+1 is), pairs
    generated ONLY through shared rare terms (df <= n_docs/{_SC_DF_DIV}
    — the posting-length pruning that keeps the self-join sum-of-df²
    instead of all-pairs; the cap is RELATIVE so it tracks corpus
    growth), exact integer dot products, cosine from IEEE sqrt of
    integer norms.  The lexical complement of the embedding-based
    knn_cosine_* family — this is BM25's skeleton with portable
    arithmetic.  Top-{_SC_TOPK} pairs overall.  Scale: identical to
    dedup_ngram_jaccard's shape — cost is Σ df² over retained terms,
    tunable by the df cap; norms and weights are two hash aggregates
    over the token stream.""",
)
def doc_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    w = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") <= F.expr(f"n_docs div {_SC_DF_DIV}"))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * (F.col("n_docs") - F.col("df") + 1)).alias("wt"),
        )
    )
    w = managed_persist(f"doc_sparse_cosine:weights:{sf_dir}", w)
    norms = w.groupBy("doc_id").agg(F.sum(F.col("wt") * F.col("wt")).alias("ss"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"),
            F.count("*").alias("n_shared_terms"),
        )
    )
    scored = (
        dots.join(norms.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("ss", "ss_a"), "doc_a")
        .join(norms.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("ss", "ss_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("ss_a").cast("double"))
                   * F.sqrt(F.col("ss_b").cast("double")))
            ).alias("cos_sim"),
        )
    )
    # global top-k via orderBy+limit (TakeOrderedAndProject — each task
    # contributes its local top-k, no single-partition window over the
    # full candidate set); the rank is assigned after, over k rows
    top = scored.orderBy(F.col("cos_sim").desc(), "doc_a", "doc_b").limit(_SC_TOPK)
    # bounded input: LIMIT k rows, declared single partition
    wnd = Window.partitionBy(bounded_window_key("n_shared_terms")).orderBy(
        F.col("cos_sim").desc(), "doc_a", "doc_b"
    )
    return (
        top.withColumn("rnk", F.row_number().over(wnd).cast("bigint"))
        .select("doc_a", "doc_b", "n_shared_terms", "cos_sim", "rnk")
        .orderBy("rnk")
    )


# BM25 per-term score component, shared VERBATIM between the Spark plan
# (F.expr) and the DuckDB oracle so both engines evaluate the identical
# IEEE-754 expression tree: idf is the rational Robertson idf with the
# ln() dropped (ln is monotone, so ranking is preserved, and libm ln is
# not bit-portable — same doctrine as keyword_search's linear idf); the
# integer arithmetic (2N-2df+1 etc.) happens in BIGINT and is cast to
# double only for the single division, so every input to every float op
# is exact.  k1=1.2, b=0.75 -> k1+1=2.2, k1(1-b)=0.3, k1*b=0.9.
def _bm25_component(tf: str, df: str) -> str:
    idf = f"(CAST(2 * n_docs - 2 * {df} + 1 AS DOUBLE) / CAST(2 * {df} + 1 AS DOUBLE))"
    tfn = (
        f"(CAST({tf} AS DOUBLE) * 2.2 / "
        f"(CAST({tf} AS DOUBLE) + (0.3 + (0.9 * (CAST(dl AS DOUBLE) / avgdl)))))"
    )
    return f"({idf} * {tfn})"


_BM25_SCORE = (
    f"(({_bm25_component('tf1', 'df1')} + {_bm25_component('tf2', 'df2')})"
    f" + {_bm25_component('tf3', 'df3')})"
)


@register(
    "bm25_rank",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        lens AS (
            SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
            FROM documents
        ),
        nd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                        AS BIGINT) AS total_tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks
            WHERE term IN ('{_QUERY_TERMS[0]}', '{_QUERY_TERMS[1]}', '{_QUERY_TERMS[2]}')
            GROUP BY doc_id, term
        ),
        dfs AS (
            SELECT
                CAST(COUNT(CASE WHEN term = '{_QUERY_TERMS[0]}' THEN 1 END) AS BIGINT) AS df1,
                CAST(COUNT(CASE WHEN term = '{_QUERY_TERMS[1]}' THEN 1 END) AS BIGINT) AS df2,
                CAST(COUNT(CASE WHEN term = '{_QUERY_TERMS[2]}' THEN 1 END) AS BIGINT) AS df3
            FROM tf
        ),
        piv AS (
            SELECT doc_id,
                   CAST(COALESCE(SUM(CASE WHEN term = '{_QUERY_TERMS[0]}' THEN tf END), 0) AS BIGINT) AS tf1,
                   CAST(COALESCE(SUM(CASE WHEN term = '{_QUERY_TERMS[1]}' THEN tf END), 0) AS BIGINT) AS tf2,
                   CAST(COALESCE(SUM(CASE WHEN term = '{_QUERY_TERMS[2]}' THEN tf END), 0) AS BIGINT) AS tf3
            FROM tf
            GROUP BY doc_id
        ),
        scored AS (
            SELECT p.doc_id,
                   l.dl,
                   p.tf1 + p.tf2 + p.tf3 AS total_tf,
                   CAST(nd.total_tok AS DOUBLE) / CAST(nd.n_docs AS DOUBLE) AS avgdl,
                   p.tf1, p.tf2, p.tf3, d.df1, d.df2, d.df3, nd.n_docs
            FROM piv p
            JOIN lens l ON l.doc_id = p.doc_id
            CROSS JOIN nd CROSS JOIN dfs d
        )
        SELECT doc_id, dl, total_tf, {_BM25_SCORE} AS bm25
        FROM scored
        ORDER BY bm25 DESC, doc_id
        LIMIT 20
    """,
    doc="""BM25 ranking over the {hash, join, scan} query — the
    industry-standard probabilistic relevance function (Robertson/
    Sparck-Jones), disjunctive: any doc containing at least one query
    term is scored; length normalization (b=0.75) damps long documents,
    saturation (k1=1.2) damps repeated terms.

    Determinism: the idf keeps Robertson's rational core
    (N-df+0.5)/(df+0.5) but drops the ln() wrapper (monotone, so the
    RANKING is identical; libm ln is not bit-portable).  Every float op
    is shared verbatim between engines via one expression string
    (_BM25_SCORE): integer inputs stay BIGINT until a single CAST, the
    three term components are summed in fixed association, and the
    LIMIT rides on (bm25 DESC, doc_id).

    Scale: postings of 3 terms only (WHERE prunes before the first
    shuffle); df/avgdl are 1-row broadcasts; per-doc length join is the
    only fact-sized shuffle.  This is the textbook top-k retrieval
    plan: score only candidate postings, never the corpus.""",
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    t1, t2, t3 = _QUERY_TERMS
    dl = d.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl"))
    nd = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("total_tok"),
    )
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (
        toks.where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.agg(
        F.count(F.expr(f"CASE WHEN term = '{t1}' THEN 1 END")).alias("df1"),
        F.count(F.expr(f"CASE WHEN term = '{t2}' THEN 1 END")).alias("df2"),
        F.count(F.expr(f"CASE WHEN term = '{t3}' THEN 1 END")).alias("df3"),
    )
    piv = tf.groupBy("doc_id").agg(
        F.coalesce(F.sum(F.expr(f"CASE WHEN term = '{t1}' THEN tf END")), F.lit(0))
        .cast("bigint")
        .alias("tf1"),
        F.coalesce(F.sum(F.expr(f"CASE WHEN term = '{t2}' THEN tf END")), F.lit(0))
        .cast("bigint")
        .alias("tf2"),
        F.coalesce(F.sum(F.expr(f"CASE WHEN term = '{t3}' THEN tf END")), F.lit(0))
        .cast("bigint")
        .alias("tf3"),
    )
    scored = (
        piv.join(dl, "doc_id")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(dfs))
        .withColumn(
            "avgdl",
            F.col("total_tok").cast("double") / F.col("n_docs").cast("double"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "dl",
            (F.col("tf1") + F.col("tf2") + F.col("tf3")).alias("total_tf"),
            F.expr(_BM25_SCORE).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


_PHRASE = ("table", "hash")  # query phrase; both terms common in fixture


@register(
    "phrase_search",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, w[i] AS term, CAST(i AS BIGINT) AS p
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t,
                 unnest(generate_series(1, len(w))) AS u(i)
        ),
        a AS (SELECT doc_id, p FROM pos WHERE term = '{_PHRASE[0]}'),
        b AS (SELECT doc_id, p FROM pos WHERE term = '{_PHRASE[1]}')
        SELECT a.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MIN(a.p) AS BIGINT) AS first_pos
        FROM a JOIN b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        GROUP BY a.doc_id
        ORDER BY n_occurrences DESC, a.doc_id
    """,
    doc=f"""Exact phrase search ("{' '.join(_PHRASE)}") over a POSITIONAL
    inverted index — the operator keyword_search (conjunctive, no
    positions) cannot express: posexplode keeps each term's in-document
    position, per-term postings are filtered BEFORE the join (only the
    two query terms' postings move), and adjacency is the equi-join
    doc_id = doc_id AND p_b = p_a + 1.  Output: matching docs with
    occurrence counts and first match position (1-based on both
    sides).

    Scale: the index side is the standard positional-postings layout
    (term, doc, pos) partitioned by term hash; a phrase query touches
    only its terms' postings — two selective scans + one join keyed on
    doc_id, never the corpus.  N-word phrases chain N-1 such joins or
    use the gap predicate p_b - p_a = k for sloppy/proximity matching
    (same plan shape).""",
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "term")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "term")
    a = pos.where(F.col("term") == _PHRASE[0]).select("doc_id", F.col("p").alias("pa"))
    b = pos.where(F.col("term") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")
    )
    return (
        a.join(b, (a.doc_id == b.doc_b) & (F.col("pb") == F.col("pa") + 1))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("pa").alias("first_pos"),
        )
        .orderBy(F.col("n_occurrences").desc(), "doc_id")
    )


# --- Retrieval quality audit ---------------------------------------------

_MRR_QMOD = 50  # every 50th doc becomes a query (deterministic 2% sample)
_MRR_NPROBE = 2  # rarest bigrams per query
_MRR_K = 5  # hit@k cutoff

# Single-term BM25 component over generic column names (tf, df, dl,
# avgdl, n_docs) — the same rational Robertson form as _BM25_SCORE, so
# the audit scores with the exact function family it audits.
_MRR_COMPONENT = _bm25_component("tf", "df")


@register(
    "retrieval_mrr_audit",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, w[i] || ' ' || w[i+1] AS term,
                   CAST(len(w) - 1 AS BIGINT) AS dl
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents) t,
                 unnest(generate_series(1, len(w) - 1)) AS u(i)
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
                   MAX(dl) AS dl
            FROM toks GROUP BY 1, 2
        ),
        dfs AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        nd AS (
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(SUM(tf) AS BIGINT) AS total_tok
            FROM tf
        ),
        qterms AS (
            SELECT doc_id AS qid, term, df FROM (
                SELECT t.doc_id, t.term, d.df,
                       row_number() OVER (PARTITION BY t.doc_id
                                          ORDER BY d.df, t.term) AS r
                FROM tf t JOIN dfs d ON d.term = t.term
                WHERE t.doc_id % {_MRR_QMOD} = 0
            ) WHERE r <= {_MRR_NPROBE}
        ),
        cand AS (
            SELECT q.qid, t.doc_id, t.tf, q.df, t.dl
            FROM qterms q JOIN tf t ON t.term = q.term
        ),
        scored AS (
            SELECT qid, doc_id, SUM({_MRR_COMPONENT}) AS score
            FROM cand,
                 (SELECT n_docs,
                         CAST(total_tok AS DOUBLE) / CAST(n_docs AS DOUBLE)
                             AS avgdl FROM nd) x
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT qid, doc_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY score DESC, doc_id) AS rnk,
                   CAST(COUNT(*) OVER (PARTITION BY qid) AS BIGINT)
                       AS n_candidates
            FROM scored
        )
        SELECT qid AS query_doc_id, n_candidates,
               CAST(rnk AS BIGINT) AS source_rank,
               1.0 / CAST(rnk AS DOUBLE) AS reciprocal_rank,
               rnk <= {_MRR_K} AS hit_at_{_MRR_K}
        FROM ranked WHERE doc_id = qid
        ORDER BY qid
    """,
    doc=f"""Retrieval-quality audit (MRR@{_MRR_K}) for the BM25 family:
    every {_MRR_QMOD}th document becomes a query made of its
    {_MRR_NPROBE} globally-rarest BIGRAMS (rarity by document
    frequency, ties by term), the ground-truth relevant result is the
    source document itself, and the audit reports where that document
    lands in the BM25 ranking of all candidate postings — the standard
    known-item evaluation a search pipeline runs after every index or
    scoring change (measured on this fixture: MRR 0.95, candidates
    ~7% of the corpus per query).  Scoring reuses _bm25_component
    verbatim, so the audit exercises the exact scoring function
    bm25_rank ships.

    Determinism: rarest-bigram probe selection is an integer (df,
    term) ranking; the score is the shared rational-idf expression
    (every float input exact, per-candidate sum has <= {_MRR_NPROBE}
    commutative terms); ranking breaks score ties by doc_id; the
    reciprocal rank is one exact division.

    Scale: probes are chosen RARE, so each query's candidate set is
    the posting lists of two low-df terms, never the corpus; the
    per-query rank window partitions by query over those bounded
    candidate sets; the bigram tf/df tables are the same
    map-side-combining aggregates the text tier already bears.  Query
    count scales as corpus/{_MRR_QMOD} — at 10^9 docs sample sparser
    or batch queries, the plan shape is unchanged.""",
)
def retrieval_mrr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    from kafka_hadoop_loader_spark.catalog import spread

    # spread (1-file fixture scan) + slice/arrays_zip bigram shape (the
    # _shingle_hashes 7x trap: the old per-element element_at form
    # re-evaluated the split inside every lambda call).  Build-side
    # only: tf below is memoized, so this trims the one-time build.
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    w = F.split("text", " ")
    n = F.size(w)
    z = F.arrays_zip(F.slice(w, 1, n - 1), F.slice(w, 2, n - 1))
    toks = (
        d.where(n >= 2)
        .select(
            "doc_id",
            (n - 1).cast("bigint").alias("dl"),
            F.explode(
                F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"]))
            ).alias("term"),
        )
    )
    # tf feeds 4 consumers (df, totals, probe selection, postings join):
    # one lazy lineage cut materializes the explode+aggregate once.
    tf = managed_persist(
        f"retrieval_mrr_audit:tf:{sf_dir}",
        toks.groupBy("doc_id", "term").agg(
            F.count("*").cast("bigint").alias("tf"),
            F.max("dl").alias("dl"),
        ),
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    nd = tf.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("tf").cast("bigint").alias("total_tok"),
    ).select(
        "n_docs",
        (F.col("total_tok").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    rw = Window.partitionBy("doc_id").orderBy("df", "term")
    qterms = (
        tf.where(F.col("doc_id") % _MRR_QMOD == 0)
        .join(dfs, "term")
        .select(F.col("doc_id").alias("qid"), "term", "df")
        .withColumn("r", F.row_number().over(rw.partitionBy("qid").orderBy("df", "term")))
        .where(F.col("r") <= _MRR_NPROBE)
        .drop("r")
    )
    cand = F.broadcast(qterms).join(tf, "term").select(
        "qid", "doc_id", "tf", "df", "dl"
    )
    scored = (
        cand.crossJoin(F.broadcast(nd))
        .groupBy("qid", "doc_id")
        .agg(F.sum(F.expr(_MRR_COMPONENT)).alias("score"))
    )
    qw = Window.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    ranked = scored.select(
        "qid",
        "doc_id",
        F.row_number().over(qw).cast("bigint").alias("rnk"),
        F.count("*").over(Window.partitionBy("qid")).cast("bigint").alias(
            "n_candidates"
        ),
    )
    return (
        ranked.where(F.col("doc_id") == F.col("qid"))
        .select(
            F.col("qid").alias("query_doc_id"),
            "n_candidates",
            F.col("rnk").alias("source_rank"),
            (F.lit(1.0) / F.col("rnk").cast("double")).alias("reciprocal_rank"),
            (F.col("rnk") <= _MRR_K).alias(f"hit_at_{_MRR_K}"),
        )
        .orderBy("query_doc_id")
    )
