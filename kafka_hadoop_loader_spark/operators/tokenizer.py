"""Tokenizer training: byte-pair-encoding merge learning as a
fixed-round DataFrame loop.

BPE training is the canonical tokenizer-building job of an LLM data
pipeline (text_token_count_bpe consumes a FIXED pre-tokenizer; this
operator LEARNS the merges).  Each round: count adjacent symbol pairs
across the word-frequency table, pick the most frequent pair
(lexicographic tie-break), and apply the merge corpus-wide.

The merge-application trick makes this exactly portable with zero
UDFs: a word's symbol sequence is encoded as ``|s1||s2||s3|`` — every
symbol wrapped in its own delimiters — so the pair (A, B) is the
substring ``|A||B|`` and merging is plain ``replace(seq, '|A||B|',
'|AB|')``.  Both engines' replace() scans left-to-right non-overlapping
(verified: 'a a a' merges to ('aa', 'a') in both), which is exactly
BPE's greedy within-word merge order, and the per-symbol delimiters
make runs like ``a b a b`` merge at every occurrence (single-delimiter
encodings lose alternate matches to boundary sharing).

Scale: the corpus state is the WORD-FREQUENCY table (|vocab| rows, not
|corpus|): pair counting explodes symbol bigrams weighted by word
count, the argmax is an ordered limit(1) broadcast back (the
tpch_q22 scalar-subquery pattern — no driver collect), and the merge
is a map-only string replace.  This is precisely how production BPE
trainers scale: rounds are sequential by nature, each round is one
count + one argmax + one map over the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.catalog import spread, table
from kafka_hadoop_loader_spark.registry import register

_ROUNDS = 2


def _pairs_sql(wtab: str, ptab: str, ttab: str, nxt: str) -> str:
    """One DuckDB BPE round: count pairs in ``wtab``, pick top, merge."""
    return f"""
        {ptab} AS (
            SELECT syms[i] AS a, syms[i + 1] AS b,
                   CAST(SUM(cnt) AS BIGINT) AS pair_cnt
            FROM (
                SELECT cnt, string_split(trim(seq, '|'), '||') AS syms
                FROM {wtab}
            ), unnest(generate_series(1, len(syms) - 1)) AS u(i)
            WHERE len(syms) >= 2
            GROUP BY a, b
        ),
        {ttab} AS (
            SELECT a, b FROM {ptab}
            ORDER BY pair_cnt DESC, a, b LIMIT 1
        ),
        {nxt} AS (
            SELECT w.word, w.cnt,
                   replace(w.seq, '|' || t.a || '||' || t.b || '|',
                           '|' || t.a || t.b || '|') AS seq
            FROM {wtab} w CROSS JOIN {ttab} t
        )
"""


@register(
    "bpe_train_merges",
    oracle=f"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            )
            WHERE word <> ''
            GROUP BY word
        ),
        w0 AS (
            SELECT word, cnt,
                   regexp_replace(word, '(.)', '|\\1|', 'g') AS seq
            FROM words
        ),
        {_pairs_sql("w0", "p1", "t1", "w1").strip()},
        {_pairs_sql("w1", "p2", "t2", "w2").strip()}
        SELECT sym AS symbol, CAST(SUM(cnt) AS BIGINT) AS n_occurrences
        FROM (
            SELECT cnt, unnest(string_split(trim(seq, '|'), '||')) AS sym
            FROM w2
        )
        GROUP BY sym
        ORDER BY n_occurrences DESC, symbol
        LIMIT 20
    """,
    doc="""Learn 2 BPE merges over the document corpus and
    report the top-20 resulting symbols by weighted occurrence count.
    Pair statistics are exact integers over the word-frequency table;
    the argmax tie-breaks lexicographically; merges apply via the
    delimiter-encoded replace (see module docstring) — every round is
    bit-identical across engines, so the learned vocabulary is too.

    Plan: per round, one weighted pair aggregate (map-side combined
    over |vocab| rows), one TakeOrderedAndProject(1) broadcast back,
    one map-only merge.  The corpus is touched exactly once (the
    initial word count); everything after runs on vocabulary-sized
    data — the property that makes BPE training feasible at 100 TB.""",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _learn_merged_vocab(spark, sf_dir)
    final_syms = F.split(F.expr("trim(BOTH '|' FROM seq)"), r"\|\|")
    return (
        w.select("cnt", F.explode(final_syms).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("cnt").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "symbol")
        .limit(20)
    )


def _learn_merged_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training loop: word-frequency table -> ``_ROUNDS`` merge
    rounds -> (word, cnt, seq) with merged symbol sequences.  Shared by
    bpe_train_merges (vocabulary report) and bpe_encode_corpus (apply
    the learned segmentation back to the corpus)."""
    d = spread(table(spark, sf_dir, "documents"))
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    w = words.withColumn(
        "seq", F.regexp_replace(F.col("word"), "(.)", r"|$1|")
    # each round references the current vocab table TWICE (pair count +
    # merge apply), so without cuts round N re-executes every earlier
    # round per reference (zero exchange reuse, r13 plan audit).  One
    # LAZY cut per round — and one on the initial word table — runs
    # each round exactly once; the vocab table is |vocab|-sized.
    ).localCheckpoint(eager=False)
    for _ in range(_ROUNDS):
        syms = F.split(F.expr("trim(BOTH '|' FROM seq)"), r"\|\|")
        nsym = F.size(syms)
        # slice+arrays_zip: the seq split evaluates once per row, not
        # once per element_at inside the lambda (the _shingle_hashes
        # trap).  Same adjacent (a, b) pairs.
        z = F.arrays_zip(
            F.slice(syms, 1, nsym - 1), F.slice(syms, 2, nsym - 1)
        )
        pairs = (
            w.where(nsym >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        z,
                        lambda s: F.struct(
                            s["0"].alias("a"), s["1"].alias("b")
                        ),
                    )
                ).alias("pr"),
            )
            .groupBy("pr.a", "pr.b")
            .agg(F.sum("cnt").alias("pair_cnt"))
        )
        top = pairs.orderBy(F.col("pair_cnt").desc(), "a", "b").limit(1).select("a", "b")
        w = (
            w.join(F.broadcast(top))
            .select(
                "word",
                "cnt",
                F.expr(
                    "replace(seq, '|' || a || '||' || b || '|', '|' || a || b || '|')"
                ).alias("seq"),
            )
            .localCheckpoint(eager=False)
        )
    return w


_ENC_ROUNDS_SQL = "\n        ".join(
    _pairs_sql(f"w{i}", f"p{i + 1}", f"t{i + 1}", f"w{i + 1}").strip() + ","
    for i in range(_ROUNDS)
)


@register(
    "bpe_encode_corpus",
    oracle=f"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            )
            WHERE word <> ''
            GROUP BY word
        ),
        w0 AS (
            SELECT word, cnt,
                   regexp_replace(word, '(.)', '|\\1|', 'g') AS seq
            FROM words
        ),
        {_ENC_ROUNDS_SQL}
        vocab AS (
            SELECT word,
                   CAST(len(string_split(trim(seq, '|'), '||')) AS BIGINT)
                       AS n_sym,
                   CAST(length(word) AS BIGINT) AS n_chars_w
            FROM w{_ROUNDS}
        ),
        dw AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_chars_w) AS BIGINT) AS n_chars,
               CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars_w) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE)
                   AS chars_per_token
        FROM dw JOIN vocab USING (word)
        WHERE word <> ''
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="""Apply the learned BPE segmentation back to the corpus: join
    each document's words against the trained vocabulary's merged
    symbol sequences and report per-document token counts and
    compression (chars per token) — the tokenize step that follows
    bpe_train_merges, and the number (tokens per doc) every training-
    data budget is denominated in.  The join is corpus-words ⨝ vocab
    on the word — vocabulary-sized build side, the exact shape of a
    production tokenizer's vocab lookup; everything upstream reuses
    the training loop (one corpus scan, vocabulary-sized rounds).
    Exact integers end-to-end; the ratio is one division.""",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _learn_merged_vocab(spark, sf_dir)
    syms = F.split(F.expr("trim(BOTH '|' FROM seq)"), r"\|\|")
    vocab = w.select(
        "word",
        F.size(syms).cast("bigint").alias("n_sym"),
        F.length("word").cast("bigint").alias("n_chars_w"),
    )
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    dw = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    return (
        dw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_chars_w").alias("n_chars"),
            F.sum("n_sym").alias("n_tokens"),
            (
                F.sum("n_chars_w").cast("double") / F.sum("n_sym").cast("double")
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "tokenizer_fertility",
    oracle=f"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            )
            WHERE word <> ''
            GROUP BY word
        ),
        w0 AS (
            SELECT word, cnt,
                   regexp_replace(word, '(.)', '|\\1|', 'g') AS seq
            FROM words
        ),
        {_ENC_ROUNDS_SQL}
        vocab AS (
            SELECT word,
                   CAST(len(string_split(trim(seq, '|'), '||')) AS BIGINT)
                       AS n_sym,
                   CAST(length(word) AS BIGINT) AS n_chars_w
            FROM w{_ROUNDS}
        ),
        dw AS (
            SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(COUNT(DISTINCT dw.word) AS BIGINT) AS n_word_types,
               CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
               CAST(SUM(n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS fertility,
               CAST(SUM(n_chars_w) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE)
                   AS chars_per_token
        FROM dw JOIN vocab USING (word)
        WHERE word <> ''
        GROUP BY lang
        ORDER BY lang
    """,
    doc="""Tokenizer fertility audit BY LANGUAGE — the equity metric a
    multilingual pretraining effort tracks per tokenizer release:
    fertility = BPE tokens emitted per whitespace word (1.0 = every
    word is one token; high fertility means a language pays more
    sequence length — and more compute — per word of content), plus
    chars-per-token compression and word-type counts.  Uses the SAME
    learned vocabulary as bpe_train_merges / bpe_encode_corpus
    (_learn_merged_vocab — the oracle replays the identical training
    rounds), so the audit measures exactly the tokenizer the other
    two queries ship.

    Scale: corpus-words x vocab join (vocab-sized build side, the
    production vocab-lookup shape) and one aggregate at language
    grain.  Exact integers; both ratios are single final divisions.""",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _learn_merged_vocab(spark, sf_dir)
    syms = F.split(F.expr("trim(BOTH '|' FROM seq)"), r"\|\|")
    vocab = w.select(
        "word",
        F.size(syms).cast("bigint").alias("n_sym"),
        F.length("word").cast("bigint").alias("n_chars_w"),
    )
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    dw = d.select("lang", F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    return (
        dw.join(vocab, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.countDistinct("word").cast("bigint").alias("n_word_types"),
            F.sum("n_sym").cast("bigint").alias("n_tokens"),
            (
                F.sum("n_sym").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("fertility"),
            (
                F.sum("n_chars_w").cast("double")
                / F.sum("n_sym").cast("double")
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )
