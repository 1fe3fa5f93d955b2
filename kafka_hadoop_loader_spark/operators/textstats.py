"""Text analysis operators for LLM-data pipelines (BASELINE.json:6):
language/source stats, token counting, TF-IDF, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in expressions (split/explode/groupBy/window) —
no Python in any hot path.  Determinism: counts are integers; ratios
are single exact divisions; the fingerprint is an integer polynomial
fold; ln() never appears in oracle-checked outputs (not correctly
rounded across libms — measured unequal on this machine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import spread, table
from kafka_hadoop_loader_spark.registry import register

# Small fixed stopword list for quality scoring (fixture vocabulary).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")


@register(
    "text_lang_stats",
    oracle="""
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS avg_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    doc="""Per-language/source corpus stats — the first report of any
    training-data pipeline (coverage + length distributions).""",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*").cast("double")).alias(
                "avg_chars"
            ),
            F.sum(n_tok).alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )


@register(
    "text_token_freq",
    oracle="""
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
        ORDER BY cnt DESC, tok
        LIMIT 20
    """,
    doc="""Global token frequency top-20 (explode -> count -> ordered
    limit).  At scale: partial aggregation makes the explode safe — the
    shuffle carries (token, partial_count), not tokens.""",
)
def text_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(20)
    )


@register(
    "text_tfidf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        tf AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY tok
        ),
        df AS (
            SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM toks GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT tf.tok AS tok, tf.tf AS tf, df.df AS df, n.n_docs AS n_docs,
               CAST(tf.tf AS DOUBLE)
                   * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
                   AS tfidf_linear
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        ORDER BY tfidf_linear DESC, tok
        LIMIT 50
    """,
    doc="""TF-IDF scoring (linear-idf variant: tf * N/df — exact rational
    arithmetic; the classic log-idf is a monotone-in-idf variant whose
    ln() is not bit-portable across engines, so the ranking key stays
    exact).  Corpus-level: term counts join document frequencies join
    the doc count — three aggregates + one broadcast-able join.""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # the corpus doc count rides INSIDE the lazy plan as a broadcast
    # 1-row cross join (text_perplexity_proxy's convention) — no eager
    # .count() action or extra scan at plan-build time
    n = d.groupBy().agg(F.count("*").alias("n_docs"))
    return (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "tok",
            "tf",
            "df",
            "n_docs",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf_linear"),
        )
        .orderBy(F.col("tfidf_linear").desc(), "tok")
        .limit(50)
    )


@register(
    "text_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
               CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)
                   AS type_token_ratio,
               CAST(n_chars AS DOUBLE) / CAST(len(w) AS DOUBLE)
                   AS avg_token_len,
               CAST(len(list_filter(w, x -> x IN {STOPWORDS!r})) AS DOUBLE)
                   / CAST(len(w) AS DOUBLE) AS stopword_ratio
        FROM t
        ORDER BY doc_id
    """,
    doc="""Per-document quality signals: token count, type/token ratio,
    average token length, stopword ratio — the standard cheap filters
    before expensive dedup/model scoring.  All exact single divisions.""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok = F.size(w).cast("bigint")
    n_dis = F.size(F.array_distinct(w)).cast("bigint")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return (
        d.select(
            "doc_id",
            "lang",
            n_tok.alias("n_tokens"),
            n_dis.alias("n_distinct"),
            (n_dis.cast("double") / n_tok.cast("double")).alias("type_token_ratio"),
            (F.col("n_chars").cast("double") / n_tok.cast("double")).alias(
                "avg_token_len"
            ),
            (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_lang_id",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(w, x -> x IN ('the','a','of','to','in')))
                        AS DOUBLE) / CAST(len(w) AS DOUBLE) AS en_score
            FROM t
        )
        SELECT doc_id, lang,
               en_score,
               (en_score >= 0.05) AS pred_en,
               (lang = 'en') = (en_score >= 0.05) AS agree
        FROM scored
        ORDER BY doc_id
    """,
    doc="""Language-ID heuristic (stopword-density n-gram scoring): a
    deterministic stand-in for a real langid model — demonstrates the
    scoring-UDF shape with pure built-ins.  Accuracy vs the fixture's
    lang column is measured in pytest (word-salad text, so agreement is
    informative, not perfect).""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    en_markers = ("the", "a", "of", "to", "in")
    score = (
        F.size(F.filter(w, lambda x: x.isin(*en_markers))).cast("double")
        / F.size(w).cast("double")
    )
    return (
        d.select(
            "doc_id",
            "lang",
            score.alias("en_score"),
            (score >= 0.05).alias("pred_en"),
            ((F.col("lang") == "en") == (score >= 0.05)).alias("agree"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(0::BIGINT,
                       [length(t)::BIGINT * 31 + unicode(t)
                        for t in string_split(text, ' ')]),
                   (acc, x) -> (acc * 131 + x) % 1000000007
               ) AS fingerprint,
               CAST(length(text) AS BIGINT) AS n_chars_check
        FROM documents
        ORDER BY doc_id
    """,
    doc="""Rolling polynomial fingerprint over the token stream
    (acc*131 + token_code mod 1e9+7): order-sensitive content signature
    in pure integer arithmetic — bit-identical across engines and
    cluster layouts, unlike float hashes.  The shape of Rabin-Karp /
    content-defined chunking used for incremental dedup.""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    codes = F.transform(
        F.split("text", " "),
        lambda t: F.length(t).cast("long") * 31 + F.ascii(t),
    )
    fp = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % 1000000007
    )
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.length("text").cast("bigint").alias("n_chars_check"),
    ).orderBy("doc_id")


_BPE_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@register(
    "text_token_count_bpe",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_PAT}'))
                    AS BIGINT) AS n_bpe_tokens,
               CAST(n_chars AS DOUBLE)
                   / CAST(len(regexp_extract_all(text, '{_BPE_PAT}'))
                          AS DOUBLE) AS chars_per_token
        FROM documents
        ORDER BY doc_id
    """,
    doc="""Token counting two ways: whitespace split and a BPE-style
    pre-tokenizer regex (word / number / punctuation runs with leading
    space attached — the GPT-2 pre-tokenizer shape, ASCII-simplified so
    Java regex and RE2 agree).  chars-per-token is the standard
    corpus-budget estimator (how many training tokens a byte budget
    buys).  Pure regexp_count per row: no shuffle at all before the
    presentation sort; at 100 TB this is a map-only pass.""",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_ws = F.size(F.split("text", " ")).cast("bigint")
    n_bpe = F.regexp_count("text", F.lit(_BPE_PAT)).cast("bigint")
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.col("n_chars").cast("double") / n_bpe.cast("double")).alias(
            "chars_per_token"
        ),
    ).orderBy("doc_id")


@register(
    "text_normalize",
    oracle="""
        WITH dirty AS (
            SELECT doc_id,
                   '  ' || upper(substr(text, 1, 50)) || ' !!  ' || text
                       AS raw
            FROM documents
        )
        SELECT doc_id,
               CAST(length(raw) AS BIGINT) AS n_chars_raw,
               trim(regexp_replace(regexp_replace(lower(raw),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
               CAST(length(trim(regexp_replace(regexp_replace(lower(raw),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT)
                   AS n_chars_norm
        FROM dirty
        ORDER BY doc_id
    """,
    doc="""Text normalization: lowercase -> strip non-alphanumerics ->
    collapse whitespace -> trim, the canonical pre-dedup cleanup pass
    (exact dedup is only as good as its normalization).  The input is
    deterministically dirtied (prepended upper-cased slice + punctuation)
    so the path is actually exercised on the clean fixture corpus.
    Map-only, no shuffle; regex classes are ASCII so Java regex and
    RE2 produce identical output.""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("  "), F.upper(F.substring("text", 1, 50)), F.lit(" !!  "), F.col("text")
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.length(raw).cast("bigint").alias("n_chars_raw"),
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    ).orderBy("doc_id")


@register(
    "text_gini_diversity",
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        c AS (
            SELECT doc_id, ws[i] AS tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM w, unnest(generate_series(1, len(ws))) AS u(i)
            GROUP BY doc_id, tok
        )
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq,
               1.0 - CAST(SUM(cnt * cnt) AS DOUBLE)
                   / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
                   AS gini_diversity
        FROM c GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="""Lexical concentration via the Gini-Simpson index
    (1 - Herfindahl): 1 - sum(cnt^2)/N^2 over the unigram counts —
    the entropy-style degenerate-text detector expressed in pure
    rational arithmetic.  Shannon entropy itself is deliberately NOT
    used in oracle-checked outputs because ln() is not bit-portable
    across libms (module docstring); Gini-Simpson ranks repetitive
    documents the same way and needs only integer sums plus one IEEE
    division, so it is engine-exact.

    Scale: explode -> two map-side-combining hash aggregates; the
    shuffle carries (doc_id, token, count) partials — identical shape
    to text_token_freq/text_repetition, embarrassingly parallel.""",
)
def text_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    c = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    tot = F.sum("cnt")
    ssq = F.sum(F.col("cnt") * F.col("cnt"))
    return (
        c.groupBy("doc_id")
        .agg(
            tot.alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            ssq.alias("sum_sq"),
            (
                F.lit(1.0)
                - ssq.cast("double") / (tot.cast("double") * tot.cast("double"))
            ).alias("gini_diversity"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_hapax_ratio",
    oracle="""
        WITH tf AS (
            SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT source, unnest(string_split(text, ' ')) AS term
                FROM documents
            )
            WHERE term <> ''
            GROUP BY source, term
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS hapax_ratio
        FROM tf
        GROUP BY source
        ORDER BY source
    """,
    doc="""Hapax legomena ratio per source: the share of vocabulary
    seen exactly once — the corpus-health lexical statistic (natural
    text runs ~40-60% hapax; far below signals boilerplate/duplication,
    far above signals OCR noise or tokenizer breakage), and the n₁
    count that Good-Turing smoothing is built from (the word-frequency
    cousin of orders_basket_size_dist's count-of-counts).  Two chained
    aggregates — (source, term) counts, then frequency-class counts —
    with one exact share division.""",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    tf = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    hapax = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return (
        tf.groupBy("source")
        .agg(
            F.count("*").alias("vocab_size"),
            F.sum("cnt").alias("n_tokens"),
            hapax.cast("bigint").alias("n_hapax"),
            (hapax.cast("double") / F.count("*").cast("double")).alias(
                "hapax_ratio"
            ),
        )
        .orderBy("source")
    )


_CODE_KEYWORDS = ("for", "if", "return", "import", "def", "class", "while", "else")


@register(
    "text_code_detect",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text,
                        '[{{}}()\\[\\];=<>+*/&|^%#@!~`$]')) AS BIGINT)
                       AS n_symbols,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                       AS n_digits,
                   CAST(len(list_filter(string_split(text, ' '),
                        w -> list_contains({list(_CODE_KEYWORDS)!r}, w)))
                        AS BIGINT) AS n_keywords,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_symbols, n_digits, n_keywords,
               CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE)
                   AS symbol_ratio,
               (CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE) >= 0.03)
                   OR (n_keywords * 20 >= n_tokens) AS looks_like_code
        FROM m
        ORDER BY doc_id
    """,
    doc="""Code-vs-prose detection — the training-data curation split
    that routes documents to different quality pipelines (code wants
    symbol density and keywords; prose wants stopword/length rules —
    cf. quality_gate): symbol-character count, digit count, programming-
    keyword hits, and the combined heuristic (symbol density ≥ 3% OR
    keywords ≥ 5% of tokens).  All signals are exact integer counts +
    single divisions; the keyword filter runs in-row over the token
    array (no explode, zero shuffle — same doctrine as
    text_repetition).

    Scale: pure map over the scan; at 100 TB this is a free rider on
    the same pass that computes the other per-document text signals
    (Spark fuses all of them into one WholeStageCodegen projection).""",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    kw_arr = F.array(*[F.lit(k) for k in _CODE_KEYWORDS])
    toks = F.split("text", " ")
    n_symbols = F.regexp_count("text", F.lit(r"[{}()\[\];=<>+*/&|^%#@!~`$]")).cast(
        "bigint"
    )
    n_digits = F.regexp_count("text", F.lit("[0-9]")).cast("bigint")
    n_keywords = F.size(
        F.filter(toks, lambda w: F.array_contains(kw_arr, w))
    ).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    symbol_ratio = n_symbols.cast("double") / F.length("text").cast("double")
    return (
        d.select(
            "doc_id",
            n_symbols.alias("n_symbols"),
            n_digits.alias("n_digits"),
            n_keywords.alias("n_keywords"),
            symbol_ratio.alias("symbol_ratio"),
            ((symbol_ratio >= 0.03) | (n_keywords * 20 >= n_tokens)).alias(
                "looks_like_code"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "text_perplexity_proxy",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        cnt AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
        scored AS (
            SELECT t.doc_id,
                   length(bin(n.n_total // cnt.c)) - 1 AS bits
            FROM toks t JOIN cnt ON t.tok = cnt.tok CROSS JOIN n
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
               CAST(SUM(bits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS bits_per_token
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="""Unigram-LM perplexity proxy for quality filtering (the CCNet
    / Gopher "LM score" signal, reduced to a corpus-self unigram
    model): each token's surprisal is the integer Shannon code length
    floor(log2(N / c(w))) — computed as length(bin(N DIV c)) - 1, an
    exact integer in both engines, because ln()/log2() doubles are not
    bit-portable across JVM and libm (the same reason text_tfidf uses
    linear idf).  Per-doc output: token count, total surprisal bits,
    and bits-per-token (one exact IEEE division per row).  High
    bits-per-token = rare-token-heavy documents (gibberish, boilerplate
    hashes); low = repetitive common-token text — both tails are what a
    pretraining quality gate trims.

    Plan: explode -> token-count hash agg -> broadcast-able join of the
    token dictionary back onto the token stream -> per-doc sum.  At
    100 TB the dictionary join is the only design decision: broadcast
    while the vocab fits (it does for word-level vocabs), else a
    shuffle join on tok — both one pass over the token stream.""",
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # the corpus token total rides INSIDE the lazy plan as a broadcast
    # 1-row cross join (no eager .count() action at build time — every
    # fn() stays a pure plan constructor)
    n_total = toks.groupBy().agg(F.count("*").alias("n_total"))
    # DIV, not "/": Spark's "/" on BIGINTs yields DOUBLE; DuckDB "//"
    # truncates.  Both DIV and "//" truncate toward zero on positives.
    bits = (F.length(F.bin(F.expr("n_total DIV c"))) - 1).cast("bigint")
    return (
        toks.join(F.broadcast(cnt), "tok")
        .crossJoin(F.broadcast(n_total))
        .select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("bits").alias("surprisal_bits"),
            (
                F.sum("bits").cast("double") / F.count("*").cast("double")
            ).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bigram_kneser_ney",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        bg AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
            WHERE len(w) >= 2
        ),
        c12 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2
        ),
        ctx AS (
            SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1f
            FROM c12 GROUP BY w1
        ),
        cont AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1r
            FROM c12 GROUP BY w2
        ),
        btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM c12)
        SELECT c.w1, c.w2, c.c12, x.c1, x.n1f, r.n1r, btot.b,
               CAST((4 * c.c12 - 3) * btot.b + 3 * x.n1f * r.n1r AS DOUBLE)
               / CAST(4 * x.c1 * btot.b AS DOUBLE) AS p_kn
        FROM c12 c
        JOIN ctx x ON c.w1 = x.w1
        JOIN cont r ON c.w2 = r.w2
        CROSS JOIN btot
        ORDER BY c.c12 DESC, c.w1, c.w2
        LIMIT 50
    """,
    doc="""Interpolated Kneser-Ney bigram probabilities — the classic
    distributed n-gram LM estimation job (the original MapReduce LM
    papers' shape), with discount d = 3/4 chosen so EVERYTHING is
    exact rational arithmetic:

        P(w2|w1) = (c12 - 3/4)/c1 + (3/4)(N1+(w1 .)/c1)(N1+(. w2)/B)
                 = ((4 c12 - 3) B + 3 N1f(w1) N1r(w2)) / (4 c1 B)

    computed as ONE double division of two exact BIGINT products (the
    regr_normal_equations convention), so the float probabilities are
    bit-identical across engines.  N1+ continuation counts come from
    the bigram-type table, never the raw stream (KN's defining trick:
    "how many contexts precede w2", not "how often w2 occurs").

    Scale: bigrams are generated IN-ROW by positional slicing (the
    cooccur_pmi pattern — no self-join); everything downstream
    aggregates the bigram-TYPE table, which is vastly smaller than the
    token stream; the context/continuation joins are on single words.
    int64 headroom: 4·c1·B overflows at c1·B ~ 2.3e18 — re-grid with
    d as a per-partition rational or move to DECIMAL(38) long before
    any real corpus gets there (a 1e12-token web corpus has
    B ~ 1e9, c1 ~ 1e8 for 'the' -> 4e17, still in range).""",
)
def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the fixture is one parquet file -> one scan partition,
    # serializing the bigram explode onto a single core (the
    # stats_bootstrap_ci finding).
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    w = F.split("text", " ")
    n = F.size(w)
    # slice+arrays_zip: split() evaluates once per row; the previous
    # sequence+element_at transform re-evaluated the split subtree in
    # every lambda call (the _shingle_hashes 7x trap, 2 evals per
    # bigram).  Same (w1, w2) pairs in the same positional order.
    z = F.arrays_zip(F.slice(w, 1, n - 1), F.slice(w, 2, n - 1))
    bg = (
        d.where(n >= 2)
        .select(
            F.explode(
                F.transform(
                    z,
                    lambda s: F.struct(
                        s["0"].alias("w1"), s["1"].alias("w2")
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    # 4 downstream references (ctx, cont, btot, final join): a LAZY
    # lineage cut materializes the expensive explode + bigram-type
    # aggregate once instead of ~4x (measured 3.1s -> ~1s at sf0.1;
    # the CC pattern — still no driver action)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint(eager=False)
    )
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("n1r"))
    btot = c12.groupBy().agg(F.count("*").alias("b"))
    p_kn = (
        ((4 * F.col("c12") - 3) * F.col("b") + 3 * F.col("n1f") * F.col("n1r"))
        .cast("double")
        / (4 * F.col("c1") * F.col("b")).cast("double")
    )
    return (
        c12.join(ctx, "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", "c12", "c1", "n1f", "n1r", "b", p_kn.alias("p_kn"))
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(50)
    )


# --- Readability ----------------------------------------------------------
# Flesch reading-ease over exact integer counts, shared expression: one
# CAST per count, two divisions, fixed association — identical IEEE
# arithmetic in both engines.  The literals parse to identical doubles.
_FLESCH = (
    "206.835E0 - 1.015E0 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))"
    " - 84.6E0 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))"
)


@register(
    "text_readability",
    oracle=f"""
        WITH counts AS (
            SELECT doc_id,
                   GREATEST(CAST(len(regexp_split_to_array(text, '[.!?]+'))
                                 - 1 AS BIGINT), 1) AS s,
                   CAST(len(regexp_split_to_array(text, ' ')) AS BIGINT) AS w,
                   GREATEST(CAST(len(regexp_split_to_array(lower(text),
                                                           '[aeiouy]+'))
                                 - 1 AS BIGINT), 1) AS syl
            FROM documents
        )
        SELECT doc_id, s AS n_sentences, w AS n_words, syl AS n_syllables,
               {_FLESCH} AS flesch,
               206835 * s * w - 1015 * w * w - 84600 * syl * s
                   >= 60000 * s * w AS easy_read
        FROM counts
        ORDER BY doc_id
    """,
    doc="""Flesch reading-ease scoring — the classic text-quality
    heuristic a pretraining pipeline uses alongside stopword/length
    gates: per document, sentence count (terminal-punctuation runs),
    word count (tokenizer whitespace convention), a syllable proxy
    (vowel-group runs — the standard dictionary-free estimator), the
    Flesch score, and an 'easy read' verdict at the conventional 60
    threshold.

    Cross-engine exactness: all three counts are separator-run counts
    via split-length (both engines keep empty fields, so parts - 1 IS
    the match count; the regexes use no syntax that differs between
    Java regex and RE2); the score is the shared _FLESCH expression;
    the threshold verdict is cross-multiplied pure BIGINT — score
    values ON the boundary cannot flip between engines.

    Scale: map-only — three regex scans per row fused into one
    projection, no shuffle at all until the output sort; composes with
    quality_gate as one more conjunct at zero extra passes.""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.select(
        "doc_id",
        F.greatest(
            (F.size(F.split("text", r"[.!?]+")) - 1).cast("bigint"), F.lit(1)
        ).alias("s"),
        F.size(F.split("text", " ")).cast("bigint").alias("w"),
        F.greatest(
            (F.size(F.split(F.lower(F.col("text")), "[aeiouy]+")) - 1).cast(
                "bigint"
            ),
            F.lit(1),
        ).alias("syl"),
    )
    return counts.select(
        "doc_id",
        F.col("s").alias("n_sentences"),
        F.col("w").alias("n_words"),
        F.col("syl").alias("n_syllables"),
        F.expr(_FLESCH).alias("flesch"),
        (
            F.lit(206835) * F.col("s") * F.col("w")
            - F.lit(1015) * F.col("w") * F.col("w")
            - F.lit(84600) * F.col("syl") * F.col("s")
            >= F.lit(60000) * F.col("s") * F.col("w")
        ).alias("easy_read"),
    ).orderBy("doc_id")


# --- Corpus novelty curve ---------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        for i in generate_series(1, len(w) - 2)])) AS g
            FROM t WHERE len(w) >= 3
        ),
        first_seen AS (
            SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc
            FROM grams GROUP BY 1
        )
        SELECT gr.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(CASE WHEN fs.first_doc = gr.doc_id THEN 1 END)
                    AS BIGINT) AS n_novel,
               CAST(COUNT(CASE WHEN fs.first_doc = gr.doc_id THEN 1 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM grams gr JOIN first_seen fs ON fs.g = gr.g
        GROUP BY 1 ORDER BY 1
    """,
    doc="""Corpus novelty curve — the data-curation signal behind
    "stop crawling this source": for each document (in doc_id ingest
    order), the fraction of its distinct 3-grams never seen in any
    earlier document.  A healthy growing corpus holds novelty high; a
    saturated or self-copying source decays toward 0 (measured on the
    fixture: 0.96 mean over the first 50 docs -> 0.37 over the last
    50).  Duplicates crater it outright, so the curve doubles as a
    cheap dedup smoke signal upstream of the MinHash tiers.

    Ingest order here is doc_id; a production run substitutes the
    crawl timestamp — first_seen is MIN over the order column either
    way.  Exact integer counts; one division per doc.

    Scale: one explode into the distinct-gram stream, a
    map-side-combining MIN per gram (the same gram-table shape the
    dedup tier already bears), and a gram-keyed join back — no
    ordered scan or running state despite the "seen before" semantics,
    because first-occurrence is an aggregate, not a traversal.""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.catalog import managed_persist

    from kafka_hadoop_loader_spark.operators.dedup import _shingle_grams

    d = table(spark, sf_dir, "documents")
    # _shingle_grams (slice+arrays_zip): split evaluates once per row,
    # not once per element inside the lambda (the _shingle_hashes 7x
    # trap; r13 wave 12).  Same distinct gram strings; <3-word docs
    # yield an empty array and are dropped by the explode, matching the
    # old size() filter.
    grams = d.select(
        "doc_id", F.explode(_shingle_grams(F.col("text"))).alias("g")
    )
    # grams feeds the first-seen aggregate AND the join back
    grams = managed_persist(f"text_ngram_novelty:grams:{sf_dir}", grams)
    first_seen = grams.groupBy("g").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_langid_confusion",
    # {lid} late-bound below to text_lang_id's registered oracle.
    oracle="""
        WITH lid AS ({lid}),
        cells AS (
            SELECT lang, pred_en, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM lid GROUP BY 1, 2
        ),
        tot AS (
            SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang
            FROM cells GROUP BY 1
        )
        SELECT c.lang, c.pred_en, c.n_docs, t.n_lang,
               CAST(c.n_docs AS DOUBLE) / CAST(t.n_lang AS DOUBLE)
                   AS share_of_lang,
               (c.lang = 'en') = c.pred_en AS is_correct_cell
        FROM cells c JOIN tot t ON t.lang = c.lang
        ORDER BY c.lang, c.pred_en
    """,
    doc="""Language-ID confusion table — the evaluation text_lang_id's
    per-doc verdicts need before the heuristic gates a corpus: per
    (gold language, predicted-English) cell, the document count and
    the share of that language, with the correct-cell flag.  The
    off-diagonal shares ARE the gate's error budget: en rows with
    pred_en=false are English the filter would wrongly drop, non-en
    rows with pred_en=true are contamination it would wrongly keep.

    The oracle nests text_lang_id's registered oracle, so the
    confusion table can never drift from the classifier it evaluates.
    Pure integer counts plus one division per cell.

    Scale: O(|langs| x 2) state off one hash aggregate over the
    classifier's output.""",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_hadoop_loader_spark.registry import REGISTRY

    lid = REGISTRY["text_lang_id"].fn(spark, sf_dir).select("lang", "pred_en")
    cells = lid.groupBy("lang", "pred_en").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    tot = cells.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_lang")
    )
    return (
        cells.join(tot, "lang")
        .select(
            "lang",
            "pred_en",
            "n_docs",
            "n_lang",
            (
                F.col("n_docs").cast("double") / F.col("n_lang").cast("double")
            ).alias("share_of_lang"),
            ((F.col("lang") == "en") == F.col("pred_en")).alias(
                "is_correct_cell"
            ),
        )
        .orderBy("lang", "pred_en")
    )


import dataclasses as _tdc  # noqa: E402

from kafka_hadoop_loader_spark.registry import REGISTRY as _TXREG  # noqa: E402

_TXREG["text_langid_confusion"] = _tdc.replace(
    _TXREG["text_langid_confusion"],
    oracle=_TXREG["text_langid_confusion"].oracle.format(
        lid=_TXREG["text_lang_id"].oracle
    ),
)
