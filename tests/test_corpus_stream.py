"""Streaming corpus maintenance: pipeline_corpus_build's ingest gate as
an incremental foreachBatch job (quality -> exact dedup within-batch and
vs the corpus hash index -> minhash-band near-dup vs index and within
batch -> benchmark decontamination), with an idempotent per-batch
partition commit.  File-stream source, availableNow micro-batches."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from kafka_hadoop_loader_spark.streaming import jobs

# Multi-minute robustness pass: excluded from the default (driver-capped)
# run; `pytest -m slow` runs it (see pytest.ini).
pytestmark = pytest.mark.slow


# 24 distinct 6-char words: passes every quality threshold (n_tok=24,
# avg token len ~7 incl. separators, TTR=1.0, zero stopwords)
_WORDS_A = [f"word{i:02d}" for i in range(24)]
_TEXT_A = " ".join(_WORDS_A)
# near-dup of A: last two words swapped out -> 3-gram Jaccard 20/24
_TEXT_C = " ".join(_WORDS_A[:22] + ["zebra9", "yonder"])
# a different near-dup of A (for the vs-corpus path in batch 2)
_TEXT_G = " ".join(_WORDS_A[:22] + ["quartz", "vortex"])
# fresh doc, disjoint vocabulary
_TEXT_H = " ".join(f"fresh{i:02d}" for i in range(24))
# quality-passing doc carrying the benchmark gram "alpha beta gamma"
_TEXT_E = " ".join(["alpha", "beta", "gamma"] + [f"etc{i:02d}" for i in range(21)])
_BENCH = ("alpha beta gamma",)


def _write_docs(path: str, docs: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def _doc_stream(spark, in_dir: str):
    raw = spark.readStream.format("text").load(in_dir)
    return raw.selectExpr(
        "from_json(value, 'doc_id bigint, source string, text string') AS r"
    ).select("r.doc_id", "r.source", "r.text")


def _decisions(spark, corpus_dir: str) -> dict[int, dict]:
    rows = spark.read.parquet(os.path.join(corpus_dir, "decisions")).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def _run(spark, tmp_path, corpus_dir: str, ckpt: str) -> None:
    q = (
        jobs.corpus_maintain_foreach_batch(
            _doc_stream(spark, str(tmp_path / "in")), corpus_dir, _BENCH
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(120)


def test_corpus_maintain_two_batches(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: A good, B exact-dup of A, C near-dup of A, D low quality,
    # E contaminated by the benchmark gram
    _write_docs(
        str(tmp_path / "in" / "b1.jsonl"),
        [
            {"doc_id": 1, "source": "web", "text": _TEXT_A},
            {"doc_id": 2, "source": "web", "text": _TEXT_A},
            {"doc_id": 3, "source": "web", "text": _TEXT_C},
            {"doc_id": 4, "source": "web", "text": "tiny doc"},
            {"doc_id": 5, "source": "web", "text": _TEXT_E},
        ],
    )
    _run(spark, tmp_path, corpus_dir, ckpt)

    dec = _decisions(spark, corpus_dir)
    assert dec[1]["accept"] is True
    # exact within-batch dup: flagged AND keep-first kept the smaller id
    assert dec[2]["dup_within_batch"] is True and dec[2]["accept"] is False
    # near-dup within batch: edge-greedy dropped the larger end, with
    # provenance pointing at the kept doc
    assert dec[3]["near_dup"] is True and dec[3]["near_match_id"] == 1
    assert dec[3]["accept"] is False
    assert dec[4]["pass_q"] is False and dec[4]["accept"] is False
    assert dec[5]["contaminated"] is True and dec[5]["accept"] is False

    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    assert {r["doc_id"] for r in idx.collect()} == {1}

    # batch 2: F exact-dup of corpus doc 1, G near-dup of corpus doc 1,
    # H genuinely new
    _write_docs(
        str(tmp_path / "in" / "b2.jsonl"),
        [
            {"doc_id": 10, "source": "web", "text": _TEXT_A},
            {"doc_id": 11, "source": "web", "text": _TEXT_G},
            {"doc_id": 12, "source": "web", "text": _TEXT_H},
        ],
    )
    _run(spark, tmp_path, corpus_dir, ckpt)

    dec = _decisions(spark, corpus_dir)
    assert dec[10]["dup_vs_corpus"] is True and dec[10]["corpus_match_id"] == 1
    assert dec[10]["accept"] is False
    assert dec[11]["near_dup"] is True and dec[11]["near_match_id"] == 1
    assert dec[11]["accept"] is False
    assert dec[12]["accept"] is True

    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    assert {r["doc_id"] for r in idx.collect()} == {1, 12}
    # the stored signature is the full 64-hash minhash array
    assert all(len(r["sig"]) == 64 for r in idx.collect())


def test_corpus_batch_commit_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once on retry: re-applying a batch must
    rewrite byte-identical state (each partition is a deterministic
    function of earlier partitions + the batch)."""
    corpus_dir = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [
            (1, "web", _TEXT_A),
            (2, "web", _TEXT_A),
            (3, "web", _TEXT_C),
        ],
        "doc_id bigint, source string, text string",
    )
    def _snap(sub: str) -> list[dict]:
        rows = spark.read.parquet(os.path.join(corpus_dir, sub)).collect()
        return sorted((r.asDict() for r in rows), key=lambda r: r["doc_id"])

    jobs.corpus_apply_ingest_batch(docs, 0, corpus_dir, _BENCH)
    first_idx = _snap("index")
    first_dec = _snap("decisions")

    # redelivery: same batch id, same rows — must converge, not append
    jobs.corpus_apply_ingest_batch(docs, 0, corpus_dir, _BENCH)
    again_idx = _snap("index")
    again_dec = _snap("decisions")
    assert first_idx == again_idx
    assert first_dec == again_dec
    assert [r["doc_id"] for r in first_idx] == [1]


def test_corpus_stream_matches_batch_funnel_on_fixture(spark):
    """Cross-check vs the BATCH funnel: feeding the fixture documents
    table through the incremental gate as one batch must reproduce
    pipeline_corpus_build's exact-dedup stage counts (quality and exact
    dedup have identical semantics; near-dup/contam rules differ by
    design — signature-estimate verify and a caller-supplied gram set —
    so only the shared stages are compared)."""
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    from kafka_hadoop_loader_spark.catalog import table

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source", "text")
    )
    with tempfile.TemporaryDirectory() as td:
        jobs.corpus_apply_ingest_batch(docs, 0, td, ())
        dec = spark.read.parquet(os.path.join(td, "decisions"))
        got_q = dec.where("pass_q").count()
        got_canon = dec.where("pass_q AND NOT dup_within_batch").count()

    from kafka_hadoop_loader_spark.operators.pipeline import (
        pipeline_corpus_build,
    )

    stages = {
        r["stage"]: r["n_units"]
        for r in pipeline_corpus_build(spark, sf_dir).collect()
    }
    assert got_q == stages["quality_pass"]
    assert got_canon == stages["exact_dedup"]


def test_corpus_gate_matches_python_model_over_random_batches(spark, tmp_path):
    """Model-based check: drive randomized multi-batch ingest through
    corpus_apply_ingest_batch and compare every per-doc decision against
    an independent pure-Python model of the gate (quality thresholds,
    within-batch keep-first, vs-corpus hash index, benchmark-gram
    contamination).  Docs are built with pairwise-DISJOINT vocabularies
    (except deliberate exact dups), so the model can also pin
    near_dup=False everywhere — any spurious band collision would
    surface as a mismatch.  Seeded rng, three seeds: deterministic."""
    import hashlib
    import random

    from kafka_hadoop_loader_spark.operators.pipeline import (
        _QG_MAX_AVG_LEN,
        _QG_MAX_STOP,
        _QG_MIN_AVG_LEN,
        _QG_MIN_TOKENS,
        _QG_MIN_TTR,
        _QG_STOPWORDS,
    )

    def model_pass_q(text: str) -> bool:
        w = text.split(" ")  # Spark split keeps empty tokens; so does this
        n = len(w)
        avg = len(text) / n
        ttr = len(set(w)) / n
        stop = sum(1 for x in w if x in _QG_STOPWORDS) / n
        return (
            n >= _QG_MIN_TOKENS
            and _QG_MIN_AVG_LEN <= avg <= _QG_MAX_AVG_LEN
            and ttr >= _QG_MIN_TTR
            and stop <= _QG_MAX_STOP
        )

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        corpus_dir = str(tmp_path / f"corpus_{seed}")
        corpus_hash: dict[str, int] = {}  # md5 -> min accepted doc_id
        next_id = 1
        all_texts: list[str] = []  # pool for dup generation

        for batch_id in range(3):
            docs: list[tuple[int, str, str]] = []
            expected: dict[int, dict] = {}
            batch_texts: dict[int, str] = {}
            for _ in range(rng.randint(5, 10)):
                kind = rng.choice(["good", "good", "dup", "junk", "contam"])
                if kind == "dup" and all_texts:
                    text = rng.choice(all_texts)
                elif kind == "junk":
                    text = "x y"
                elif kind == "contam":
                    text = " ".join(
                        ["alpha", "beta", "gamma"]
                        + [f"c{next_id}x{j:02d}" for j in range(21)]
                    )
                else:
                    text = " ".join(f"g{next_id}x{j:02d}" for j in range(24))
                docs.append((next_id, "web", text))
                batch_texts[next_id] = text
                all_texts.append(text)
                next_id += 1

            # pure-Python model of the gate, same order of rules
            batch_min: dict[str, int] = {}
            for doc_id, _, text in docs:
                if model_pass_q(text):
                    h = hashlib.md5(text.encode()).hexdigest()
                    batch_min.setdefault(h, doc_id)
            for doc_id, _, text in docs:
                h = hashlib.md5(text.encode()).hexdigest()
                pq = model_pass_q(text)
                dup_within = pq and batch_min[h] < doc_id
                match = corpus_hash.get(h)
                w = text.split(" ")
                grams = {
                    " ".join(w[i : i + 3]) for i in range(len(w) - 2)
                } if len(w) >= 3 else set()
                contam = bool(grams & set(_BENCH))
                accept = (
                    pq
                    and not dup_within
                    and match is None
                    and not contam
                )
                expected[doc_id] = {
                    "pass_q": pq,
                    "dup_within_batch": dup_within,
                    "corpus_match_id": match,
                    "dup_vs_corpus": match is not None,
                    "near_dup": False,  # disjoint vocab by construction
                    "contaminated": contam,
                    "accept": accept,
                }

            batch = spark.createDataFrame(
                docs, "doc_id bigint, source string, text string"
            )
            jobs.corpus_apply_ingest_batch(batch, batch_id, corpus_dir, _BENCH)
            got = {
                r["doc_id"]: r.asDict()
                for r in spark.read.parquet(
                    os.path.join(corpus_dir, "decisions", f"ingest_batch={batch_id}")
                ).collect()
            }
            assert set(got) == set(expected), (seed, batch_id)
            for doc_id, exp in expected.items():
                for k, v in exp.items():
                    assert got[doc_id][k] == v, (
                        seed, batch_id, doc_id, k, got[doc_id][k], v
                    )
                # model the index update only for accepted docs
                if exp["accept"]:
                    h = hashlib.md5(
                        batch_texts[doc_id].encode()
                    ).hexdigest()
                    corpus_hash.setdefault(h, doc_id)


def test_corpus_gate_survives_all_rejected_first_batch(spark, tmp_path):
    """A batch that accepts NOTHING still commits its (empty) index
    partition; subsequent batches must read that state without error
    and see an empty corpus (explicit read schema — no parquet footer
    to infer from)."""
    corpus_dir = str(tmp_path / "corpus")
    junk = spark.createDataFrame(
        [(1, "web", "x y"), (2, "web", "p q")],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(junk, 0, corpus_dir, _BENCH)
    good = spark.createDataFrame(
        [(3, "web", _TEXT_A)], "doc_id bigint, source string, text string"
    )
    jobs.corpus_apply_ingest_batch(good, 1, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[1]["accept"] is False and dec[2]["accept"] is False
    assert dec[3]["accept"] is True and dec[3]["dup_vs_corpus"] is False
    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    assert {r["doc_id"] for r in idx.collect()} == {3}

# Borderline near-dup pair for the within-batch EXACT-Jaccard verify:
# B shares A's first 17 words (15 of 29 distinct 3-grams, exact
# Jaccard 0.5172 >= 0.5) and was searched (over fresh-tail variants)
# so that its 64-minhash signature agrees with A's in only 28/64
# positions (0.4375 < 0.5) while still colliding in exactly one LSH
# band.  The retired signature-agreement verify called this pair NOT
# a near-dup; pipeline_corpus_build's exact verify — which the
# within-batch path now shares — says it is.
_TEXT_B_BORDERLINE = " ".join(_WORDS_A[:17] + [f"t33q{j:02d}" for j in range(7)])


def test_corpus_within_batch_near_dup_verifies_exact_jaccard(spark, tmp_path):
    """Within-batch candidates must get the batch cascade's exact
    shingle-Jaccard verdict, not the signature estimate (that estimate
    is reserved for the vs-corpus path, where state is 64 longs/doc)."""
    corpus_dir = str(tmp_path / "corpus")
    batch = spark.createDataFrame(
        [(1, "web", _TEXT_A), (2, "web", _TEXT_B_BORDERLINE)],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(batch, 0, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[1]["accept"] is True
    assert dec[2]["near_dup"] is True and dec[2]["near_match_id"] == 1
    assert dec[2]["accept"] is False
    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    assert {r["doc_id"] for r in idx.collect()} == {1}


def test_corpus_maintain_sets_default_checkpoint(spark, tmp_path):
    """corpus_maintain_foreach_batch must supply a checkpointLocation
    itself (default {corpus_dir}/_checkpoint): with only a temp
    checkpoint, a restarted stream replays from batch_id 0 with
    potentially different batch boundaries and the per-batch overwrite
    doctrine corrupts the index log.  Run two availableNow passes with
    NO caller-set checkpoint and assert batch numbering continued."""
    corpus_dir = str(tmp_path / "corpus")
    _write_docs(
        str(tmp_path / "in" / "b1.jsonl"),
        [{"doc_id": 1, "source": "web", "text": _TEXT_A}],
    )
    q = jobs.corpus_maintain_foreach_batch(
        _doc_stream(spark, str(tmp_path / "in")), corpus_dir, _BENCH
    ).start()
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(corpus_dir, "_checkpoint"))

    _write_docs(
        str(tmp_path / "in" / "b2.jsonl"),
        [{"doc_id": 10, "source": "web", "text": _TEXT_A}],
    )
    q = jobs.corpus_maintain_foreach_batch(
        _doc_stream(spark, str(tmp_path / "in")), corpus_dir, _BENCH
    ).start()
    q.awaitTermination(120)

    dec = _decisions(spark, corpus_dir)
    # continuity: the second run resumed past batch 0, saw doc 1 in the
    # corpus state, and flagged the redelivered text as a corpus dup —
    # with a fresh temp checkpoint it would have re-run batch 0 and
    # doc 10 would have landed in doc 1's own partition instead
    assert dec[1]["accept"] is True
    assert dec[10]["dup_vs_corpus"] is True and dec[10]["corpus_match_id"] == 1
    dec_batches = {
        r["ingest_batch"]
        for r in spark.read.parquet(
            os.path.join(corpus_dir, "decisions")
        ).select("ingest_batch").distinct().collect()
    }
    assert dec_batches == {0, 1}


def _index_partitions(corpus_dir: str) -> set[str]:
    root = os.path.join(corpus_dir, "index")
    return {p for p in os.listdir(root) if p.startswith("ingest_batch=")}


def test_corpus_compact_index(spark, tmp_path):
    """Compaction merges the per-batch index partitions (plus any prior
    base) into the single ingest_batch=-1 base, preserves every gate
    behavior against the compacted state (exact dup, near-dup via the
    stored band keys, keep-first provenance), never touches decisions/,
    and refuses to absorb the newest (replayable) batch."""
    import pytest

    corpus_dir = str(tmp_path / "corpus")
    texts = {
        0: _TEXT_A,     # batch 0: accepted
        1: _TEXT_H,     # batch 1: accepted (disjoint vocab)
        2: " ".join(f"other{i:02d}" for i in range(24)),  # batch 2: accepted
    }
    for b, t in texts.items():
        batch = spark.createDataFrame(
            [(b * 10 + 1, "web", t)], "doc_id bigint, source string, text string"
        )
        jobs.corpus_apply_ingest_batch(batch, b, corpus_dir, _BENCH)
    assert _index_partitions(corpus_dir) == {
        "ingest_batch=0", "ingest_batch=1", "ingest_batch=2"
    }

    # newest committed batch (2) is replayable: compacting it must raise
    with pytest.raises(ValueError):
        jobs.corpus_compact_index(spark, corpus_dir, upto_batch=2)

    rep = jobs.corpus_compact_index(spark, corpus_dir)  # default: upto 1
    assert rep["compacted_batches"] == [0, 1]
    assert rep["base_rows"] == 2
    assert rep["files_after"] >= 1
    assert _index_partitions(corpus_dir) == {"ingest_batch=-1", "ingest_batch=2"}
    # staging dir cleaned up (run-unique _compact_tmp-*)
    assert not [
        d for d in os.listdir(os.path.join(corpus_dir, "index"))
        if d.startswith("_compact_tmp")
    ]

    # the gate against compacted state: exact dup of the batch-0 doc,
    # near-dup of the batch-0 doc (stored band keys must survive the
    # rewrite), and a genuinely new doc
    batch3 = spark.createDataFrame(
        [
            (100, "web", _TEXT_A),
            (101, "web", _TEXT_C),
            (102, "web", " ".join(f"novel{i:02d}" for i in range(24))),
        ],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(batch3, 3, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[100]["dup_vs_corpus"] is True and dec[100]["corpus_match_id"] == 1
    assert dec[101]["near_dup"] is True and dec[101]["near_match_id"] == 1
    assert dec[102]["accept"] is True
    # decisions audit log keeps the full per-batch provenance
    dec_batches = {
        r["ingest_batch"]
        for r in spark.read.parquet(os.path.join(corpus_dir, "decisions"))
        .select("ingest_batch").distinct().collect()
    }
    assert dec_batches == {0, 1, 2, 3}

    # second compaction: base + batches 2..3 -> base, newest (3) kept;
    # re-reading the whole index shows each doc exactly once
    rep2 = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep2["compacted_batches"] == [2]
    assert _index_partitions(corpus_dir) == {"ingest_batch=-1", "ingest_batch=3"}
    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    ids = [r["doc_id"] for r in idx.collect()]
    assert sorted(ids) == [1, 11, 21, 102]
    assert len(ids) == len(set(ids))  # no duplicate rows after rewrites
    # base rows read back with ingest_batch=-1 from the directory name
    assert idx.where("ingest_batch = -1").count() == 3

    # nothing left to compact below the newest batch: clean no-op
    rep3 = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep3["compacted_batches"] == []


def test_corpus_compact_index_tolerates_duplicate_rows(spark, tmp_path):
    """Doctrine check: a crashed prior compaction can leave a row
    visible twice (new base file moved in, old copy not yet deleted).
    The gate must still work, and the next compaction must dedupe."""
    corpus_dir = str(tmp_path / "corpus")
    for b, (doc_id, t) in enumerate([(1, _TEXT_A), (2, _TEXT_H), (3, " ".join(f"zz{i:02d}" for i in range(24)))]):
        batch = spark.createDataFrame(
            [(doc_id, "web", t)], "doc_id bigint, source string, text string"
        )
        jobs.corpus_apply_ingest_batch(batch, b, corpus_dir, _BENCH)
    # simulate the crash window: copy batch 0's accepted row into an
    # extra file inside batch 1's partition (same bytes, twice visible)
    import shutil
    root = os.path.join(corpus_dir, "index")
    # pick the part file that actually holds the row (the write can
    # leave an empty sibling part file; listdir order is arbitrary)
    src = max(
        (
            f for f in os.listdir(os.path.join(root, "ingest_batch=0"))
            if f.endswith(".parquet")
        ),
        key=lambda f: os.path.getsize(os.path.join(root, "ingest_batch=0", f)),
    )
    shutil.copy(
        os.path.join(root, "ingest_batch=0", src),
        os.path.join(root, "ingest_batch=1", "dup-" + src),
    )
    # a real crash recovery starts a fresh session (empty listing
    # cache); this session already listed the path, so drop the cache
    spark.catalog.refreshByPath(root)
    idx = spark.read.parquet(root)
    assert idx.where("doc_id = 1").count() == 2  # duplicate is visible

    # gate still correct against duplicated state
    batch = spark.createDataFrame(
        [(50, "web", _TEXT_A)], "doc_id bigint, source string, text string"
    )
    jobs.corpus_apply_ingest_batch(batch, 3, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[50]["dup_vs_corpus"] is True and dec[50]["corpus_match_id"] == 1

    # compaction dedupes on doc_id (doc 50 was rejected as a corpus
    # dup above, so the index holds exactly the three accepted docs)
    jobs.corpus_compact_index(spark, corpus_dir)
    idx = spark.read.parquet(root)
    assert idx.where("doc_id = 1").count() == 1
    assert sorted(r["doc_id"] for r in idx.collect()) == [1, 2, 3]


def test_corpus_compact_index_keeps_reused_doc_id_entries(spark, tmp_path):
    """Nothing in the gate forbids a doc_id reappearing in a later batch
    with DIFFERENT text; both index entries are live dedup state, so
    compaction must key its crash-duplicate dedupe on (doc_id, h), not
    doc_id alone — keying on doc_id would drop one hash entry and
    silently re-admit that text on redelivery."""
    corpus_dir = str(tmp_path / "corpus")
    reused_texts = [_TEXT_A, _TEXT_H]  # disjoint vocab, both accepted
    for b, t in enumerate(reused_texts):
        batch = spark.createDataFrame(
            [(7, "web", t)], "doc_id bigint, source string, text string"
        )
        jobs.corpus_apply_ingest_batch(batch, b, corpus_dir, _BENCH)
    # third batch so the two reused-id batches are both compactable
    jobs.corpus_apply_ingest_batch(
        spark.createDataFrame(
            [(8, "web", " ".join(f"pad{i:02d}" for i in range(24)))],
            "doc_id bigint, source string, text string",
        ),
        2,
        corpus_dir,
        _BENCH,
    )
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]
    assert rep["base_rows"] == 2  # BOTH hash entries for doc_id 7 survive

    # redeliveries of each text must still be flagged vs the compacted base
    batch = spark.createDataFrame(
        [(100, "web", reused_texts[0]), (101, "web", reused_texts[1])],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(batch, 3, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[100]["dup_vs_corpus"] is True
    assert dec[101]["dup_vs_corpus"] is True


def _ingest_three_batches(spark, corpus_dir):
    """Three accepted docs in batches 0..2 (disjoint vocab)."""
    for b, t in enumerate([
        _TEXT_A, _TEXT_H, " ".join(f"lk{i:02d}" for i in range(24))
    ]):
        batch = spark.createDataFrame(
            [(b * 10 + 1, "web", t)], "doc_id bigint, source string, text string"
        )
        jobs.corpus_apply_ingest_batch(batch, b, corpus_dir, _BENCH)


def test_corpus_compact_index_single_flight_lock(spark, tmp_path):
    """The single-flight doctrine is ENFORCED: a fresh _compact_lock in
    the index root makes a second invocation raise without touching any
    state; a stale lock (crashed run, mtime past the TTL) is reclaimed;
    and the lock is released even when the job raises."""
    import pytest

    corpus_dir = str(tmp_path / "corpus")
    _ingest_three_batches(spark, corpus_dir)
    root = os.path.join(corpus_dir, "index")
    lock = os.path.join(root, "_compact_lock")

    # 1. fresh lock (a live concurrent compaction) -> refuse, state intact
    with open(lock, "w") as f:
        f.write('{"run_id": "other-live-run"}')
    before = _index_partitions(corpus_dir)
    with pytest.raises(RuntimeError, match="single-flight"):
        jobs.corpus_compact_index(spark, corpus_dir)
    assert os.path.exists(lock), "the holder's lock must not be touched"
    assert _index_partitions(corpus_dir) == before, "no partition touched"

    # 2. stale lock (crashed run): mtime older than the TTL -> reclaimed,
    #    compaction proceeds, lock gone afterwards
    stale = time.time() - 7200.0
    os.utime(lock, (stale, stale))
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]
    assert not os.path.exists(lock), "lock must be released in finally"
    assert "ingest_batch=-1" in _index_partitions(corpus_dir)

    # 3. a raising run (newest batch requested) still releases the lock
    with pytest.raises(ValueError):
        jobs.corpus_compact_index(spark, corpus_dir, upto_batch=2)
    assert not os.path.exists(lock)
    # and the next legitimate run acquires normally (no-op: nothing
    # below the newest batch remains, base already absorbed 0-1)
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == []
    assert not os.path.exists(lock)


def test_corpus_compact_lock_release_is_ownership_checked(
    spark, tmp_path, monkeypatch
):
    """A run that outlives lock_ttl_sec can have its lock RECLAIMED by
    a second invocation; when the first run finally finishes, its
    release must NOT delete the second run's lock (that would admit a
    third concurrent compaction).  Simulate the reclaim by swapping the
    lock payload mid-run: the finally must leave the foreign lock in
    place."""
    corpus_dir = str(tmp_path / "corpus")
    _ingest_three_batches(spark, corpus_dir)
    lock = os.path.join(corpus_dir, "index", "_compact_lock")

    real_body = jobs._corpus_compact_index_locked

    def reclaiming_body(*args, **kwargs):
        # the TTL fired and another invocation re-acquired the lock
        # while we were still compacting
        with open(lock, "w") as f:
            f.write('{"run_id": "reclaimer-run"}')
        return real_body(*args, **kwargs)

    monkeypatch.setattr(
        jobs, "_corpus_compact_index_locked", reclaiming_body
    )
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]
    assert os.path.exists(lock), "the reclaimer's lock must survive"
    with open(lock) as f:
        assert json.load(f)["run_id"] == "reclaimer-run"

    # the reclaimer (still live by mtime) now blocks a third run
    monkeypatch.setattr(jobs, "_corpus_compact_index_locked", real_body)
    import pytest

    with pytest.raises(RuntimeError, match="single-flight"):
        jobs.corpus_compact_index(spark, corpus_dir)
    os.remove(lock)  # release the fake reclaimer for later tests


def test_corpus_compact_lock_acquire_write_failure_releases(
    spark, tmp_path, monkeypatch
):
    """If the lock PAYLOAD write fails after the atomic create
    succeeded, the half-created lock must be deleted before the error
    propagates — an ownerless lock here would block every compaction
    until the TTL expired."""
    import pytest

    corpus_dir = str(tmp_path / "corpus")
    _ingest_three_batches(spark, corpus_dir)
    lock = os.path.join(corpus_dir, "index", "_compact_lock")

    real_dumps = json.dumps

    def failing_dumps(obj, *a, **kw):
        if isinstance(obj, dict) and "run_id" in obj:
            raise OSError("simulated payload write failure")
        return real_dumps(obj, *a, **kw)

    monkeypatch.setattr(json, "dumps", failing_dumps)
    with pytest.raises(OSError, match="simulated payload"):
        jobs.corpus_compact_index(spark, corpus_dir)
    assert not os.path.exists(lock), "half-created lock must be cleaned"

    # the very next run acquires immediately (no TTL wait)
    monkeypatch.setattr(json, "dumps", real_dumps)
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]
    assert not os.path.exists(lock)


def test_corpus_ingest_mid_compaction_never_loses_state(
    spark, tmp_path, monkeypatch
):
    """Quiescing ingest during compaction is the caller's job, but the
    crash-window doctrine claims a batch that lands mid-compaction is
    still SAFE: before the swap the old partitions are fully visible;
    after the swap (before the deletes) rows are visible TWICE, and the
    gate's reads tolerate duplicates (min(doc_id) per hash, distinct
    band candidates).  Pin both halves by interleaving one ingest batch
    at each side of the staging->swap seam: a duplicate document must
    be detected at both points, and post-compaction state converges."""
    corpus_dir = str(tmp_path / "corpus")
    _ingest_three_batches(spark, corpus_dir)
    schema = "doc_id bigint, source string, text string"

    real_swap = jobs._compact_swap_files

    def interleaving_swap(fs, jvm_path, tmp, base_dir):
        # BEFORE the swap: staging is underscore-hidden, sources intact
        jobs.corpus_apply_ingest_batch(
            spark.createDataFrame([(31, "web", _TEXT_A)], schema),
            3, corpus_dir, _BENCH,
        )
        moved = real_swap(fs, jvm_path, tmp, base_dir)
        # AFTER the swap, BEFORE the source deletes: base + old
        # partitions both visible — every compacted row appears twice
        jobs.corpus_apply_ingest_batch(
            spark.createDataFrame([(41, "web", _TEXT_A)], schema),
            4, corpus_dir, _BENCH,
        )
        return moved

    monkeypatch.setattr(jobs, "_compact_swap_files", interleaving_swap)
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]

    dec = _decisions(spark, corpus_dir)
    assert dec[31]["dup_vs_corpus"] is True and dec[31]["corpus_match_id"] == 1
    assert dec[41]["dup_vs_corpus"] is True and dec[41]["corpus_match_id"] == 1

    # converged state: a post-compaction arrival still dedups against
    # the doc that now lives only in the base partition
    monkeypatch.setattr(jobs, "_compact_swap_files", real_swap)
    jobs.corpus_apply_ingest_batch(
        spark.createDataFrame([(51, "web", _TEXT_A)], schema),
        5, corpus_dir, _BENCH,
    )
    dec = _decisions(spark, corpus_dir)
    assert dec[51]["dup_vs_corpus"] is True and dec[51]["corpus_match_id"] == 1


def test_corpus_decisions_retain(spark, tmp_path):
    """The audit log's retention sweeper: keep the newest N batch
    partitions, expire the rest; newest-batch protection, dry-run
    probe, single-flight lock sharing, idempotence, and independence
    from the dedup index (retention never weakens dedup)."""
    import pytest

    corpus_dir = str(tmp_path / "corpus")
    _ingest_three_batches(spark, corpus_dir)
    droot = os.path.join(corpus_dir, "decisions")
    lock = os.path.join(corpus_dir, "index", "_compact_lock")
    schema = "doc_id bigint, source string, text string"

    # keep_batches < 1 would expire the redeliverable newest batch
    with pytest.raises(ValueError, match="keep_batches"):
        jobs.corpus_decisions_retain(spark, corpus_dir, 0)

    # dry run: reports what would expire, deletes nothing, takes no lock
    rep = jobs.corpus_decisions_retain(spark, corpus_dir, 2, dry_run=True)
    assert rep["deleted_batches"] == [0]
    assert rep["kept_batches"] == [1, 2]
    assert rep["dry_run"] is True and rep["files_deleted"] > 0
    assert os.path.isdir(os.path.join(droot, "ingest_batch=0"))

    # a live maintenance lock blocks the sweep but not the dry probe
    with open(lock, "w") as f:
        f.write('{"run_id": "live-compaction"}')
    assert jobs.corpus_decisions_retain(
        spark, corpus_dir, 2, dry_run=True
    )["deleted_batches"] == [0]
    with pytest.raises(RuntimeError, match="single-flight"):
        jobs.corpus_decisions_retain(spark, corpus_dir, 2)
    os.remove(lock)

    # the real sweep: batch 0 expired, lock released, audit readable
    rep = jobs.corpus_decisions_retain(spark, corpus_dir, 2)
    assert rep["deleted_batches"] == [0] and rep["dry_run"] is False
    assert not os.path.exists(os.path.join(droot, "ingest_batch=0"))
    assert not os.path.exists(lock)
    assert set(_decisions(spark, corpus_dir)) == {11, 21}

    # idempotent: nothing left to expire at the same keep level
    rep = jobs.corpus_decisions_retain(spark, corpus_dir, 2)
    assert rep["deleted_batches"] == [] and rep["kept_batches"] == [1, 2]
    # keep_batches beyond the partition count keeps everything
    rep = jobs.corpus_decisions_retain(spark, corpus_dir, 100)
    assert rep["deleted_batches"] == [] and rep["kept_batches"] == [1, 2]

    # retention touches ONLY the audit log: the batch-0 doc's index
    # state survives, so its duplicate is still rejected
    jobs.corpus_apply_ingest_batch(
        spark.createDataFrame([(99, "web", _TEXT_A)], schema),
        3, corpus_dir, _BENCH,
    )
    dec = _decisions(spark, corpus_dir)
    assert dec[99]["dup_vs_corpus"] is True and dec[99]["corpus_match_id"] == 1

    # absent decisions dir: a clean empty report
    rep = jobs.corpus_decisions_retain(spark, str(tmp_path / "nope"), 1)
    assert rep == {"kept_batches": [], "deleted_batches": [],
                   "files_deleted": 0, "dry_run": False}


def test_corpus_maintenance_jobs_compose(spark, tmp_path):
    """The maintenance trio (ingest gate, index compaction, audit
    retention) must interoperate on one corpus in any sensible order:
    compaction never touches the audit log, retention never touches
    the index, and the gate keeps rejecting duplicates across both.
    Sequence: ingest 0-2 -> compact -> retain -> ingest a dup ->
    compact again -> retain again."""
    corpus_dir = str(tmp_path / "corpus")
    schema = "doc_id bigint, source string, text string"
    _ingest_three_batches(spark, corpus_dir)

    # compact 0-1 into the base; audit partitions untouched (still 0-2)
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]
    assert set(_decisions(spark, corpus_dir)) == {1, 11, 21}

    # retain newest 1: audit keeps only batch 2; index base unaffected
    rep = jobs.corpus_decisions_retain(spark, corpus_dir, 1)
    assert rep["deleted_batches"] == [0, 1] and rep["kept_batches"] == [2]
    assert set(_decisions(spark, corpus_dir)) == {21}

    # a dup of the batch-0 doc (now base-only in the index, expired
    # from the audit log) is still rejected — retention never weakens
    # dedup state
    jobs.corpus_apply_ingest_batch(
        spark.createDataFrame([(31, "web", _TEXT_A)], schema),
        3, corpus_dir, _BENCH,
    )
    dec = _decisions(spark, corpus_dir)
    assert dec[31]["dup_vs_corpus"] is True and dec[31]["corpus_match_id"] == 1

    # second compaction absorbs batch 2 (and the empty batch 3 stays,
    # being newest); the base still answers for every accepted doc
    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [2]
    jobs.corpus_apply_ingest_batch(
        spark.createDataFrame([(41, "web", _TEXT_H)], schema),
        4, corpus_dir, _BENCH,
    )
    dec = _decisions(spark, corpus_dir)
    assert dec[41]["dup_vs_corpus"] is True and dec[41]["corpus_match_id"] == 11

    # retention after the second compaction: only audit batches expire,
    # ids keep ascending past the compacted region
    rep = jobs.corpus_decisions_retain(spark, corpus_dir, 2)
    assert rep["deleted_batches"] == [2] and rep["kept_batches"] == [3, 4]
    assert not os.path.exists(
        os.path.join(corpus_dir, "index", "_compact_lock")
    )


def test_corpus_vs_corpus_near_dup_verifies_exact_within_budget(spark, tmp_path):
    """VS-CORPUS candidates must ALSO get the batch cascade's exact
    shingle-Jaccard verdict when the corpus partner stored its
    budget-bounded shingle set — the r9 boundary divergence, closed for
    every partner doc at or under shingle_state_budget.  Uses the same
    searched borderline pair as the within-batch test: exact Jaccard
    0.5172 >= 0.5 but signature agreement 28/64 = 0.4375 < 0.5, so the
    retired estimate-only verify accepted the near-dup."""
    corpus_dir = str(tmp_path / "corpus")
    a = spark.createDataFrame(
        [(1, "web", _TEXT_A)], "doc_id bigint, source string, text string"
    )
    jobs.corpus_apply_ingest_batch(a, 0, corpus_dir, _BENCH)
    # doc 1 is short (29 distinct shingles << 512): shingles stored
    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    srow = idx.where("doc_id = 1").select("s").first()
    assert srow["s"] is not None and len(srow["s"]) > 0

    b = spark.createDataFrame(
        [(2, "web", _TEXT_B_BORDERLINE)],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(b, 1, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[2]["near_dup"] is True and dec[2]["near_match_id"] == 1
    assert dec[2]["accept"] is False
    # verdict matches pipeline_corpus_build's cascade on the same pair:
    # the within-batch test pinned exactly that, so batch and boundary
    # agree wherever the budget holds


def test_corpus_vs_corpus_falls_back_to_estimate_over_budget(spark, tmp_path):
    """A partner doc OVER the shingle-state budget stores s=null, and
    the same borderline pair then gets the signature-agreement estimate
    (0.4375 < 0.5 -> not a near-dup): the documented fallback, selected
    per-doc by the budget, with budget=0 recovering the pure-signature
    behavior."""
    corpus_dir = str(tmp_path / "corpus")
    a = spark.createDataFrame(
        [(1, "web", _TEXT_A)], "doc_id bigint, source string, text string"
    )
    jobs.corpus_apply_ingest_batch(a, 0, corpus_dir, _BENCH,
                                   shingle_state_budget=0)
    idx = spark.read.parquet(os.path.join(corpus_dir, "index"))
    assert idx.where("doc_id = 1").select("s").first()["s"] is None

    b = spark.createDataFrame(
        [(2, "web", _TEXT_B_BORDERLINE)],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(b, 1, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[2]["near_dup"] is False and dec[2]["accept"] is True


def test_corpus_gate_ignores_compact_lock(spark, tmp_path):
    """A leftover _compact_lock (crashed compaction, not yet reclaimed)
    must be invisible to the gate's index reads: Spark's file index
    skips underscore-prefixed files, which is exactly why the lock
    lives at {index}/_compact_lock.  Pin that assumption."""
    corpus_dir = str(tmp_path / "corpus")
    a = spark.createDataFrame(
        [(1, "web", _TEXT_A)], "doc_id bigint, source string, text string"
    )
    jobs.corpus_apply_ingest_batch(a, 0, corpus_dir, _BENCH)
    with open(os.path.join(corpus_dir, "index", "_compact_lock"), "w") as f:
        f.write('{"run_id": "crashed"}')
    dup = spark.createDataFrame(
        [(2, "web", _TEXT_A)], "doc_id bigint, source string, text string"
    )
    jobs.corpus_apply_ingest_batch(dup, 1, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[2]["dup_vs_corpus"] is True and dec[2]["corpus_match_id"] == 1


def test_corpus_shingle_budget_boundary(spark, tmp_path):
    """Off-by-one pin on the budget comparison: a doc with EXACTLY
    shingle_state_budget distinct shingles stores its set (<=, not <);
    one more shingle stores null.  n distinct words -> n-2 distinct
    3-gram shingles, so 24 words = 22 shingles, 25 words = 23."""
    corpus_dir = str(tmp_path / "corpus")
    at_budget = " ".join(f"aa{i:04d}" for i in range(24))      # 22 shingles
    over_budget = " ".join(f"bb{i:04d}" for i in range(25))    # 23 shingles
    batch = spark.createDataFrame(
        [(1, "web", at_budget), (2, "web", over_budget)],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(batch, 0, corpus_dir, _BENCH,
                                   shingle_state_budget=22)
    rows = {
        r["doc_id"]: r["s"]
        for r in spark.read.parquet(
            os.path.join(corpus_dir, "index")
        ).select("doc_id", "s").collect()
    }
    assert rows[1] is not None and len(rows[1]) == 22
    assert rows[2] is None


def test_corpus_near_dup_verdicts_are_sound_over_random_batches(spark, tmp_path):
    """Soundness fuzz for the round-10 exact-verify class: drive random
    multi-batch ingest where docs share sliding word-ranges of a common
    vocabulary (so cross- and within-batch pairs span the whole Jaccard
    spectrum), keep every doc under the shingle budget, and assert that
    EVERY near_dup flag names a partner whose word-3-gram Jaccard with
    the flagged doc is >= ND_JACCARD_T — the batch cascade's exact rule.
    With every partner within budget there is no estimate path, so a
    single sub-threshold flagged pair means the vs-corpus (or
    within-batch) verify diverged from the cascade.  Seeded, two seeds:
    deterministic."""
    import random

    from kafka_hadoop_loader_spark.operators.dedup import ND_JACCARD_T

    def shingles(text: str) -> set[tuple[str, str, str]]:
        w = text.split(" ")
        return {tuple(w[i:i + 3]) for i in range(len(w) - 2)}

    def jac(a: str, b: str) -> float:
        sa, sb = shingles(a), shingles(b)
        return len(sa & sb) / len(sa | sb)

    vocab = [f"v{i:04d}" for i in range(60)]
    for seed in (11, 42):
        rng = random.Random(seed)
        corpus_dir = str(tmp_path / f"corpus_{seed}")
        texts: dict[int, str] = {}
        next_id = 1
        for batch_id in range(3):
            docs = []
            for _ in range(rng.randint(6, 9)):
                start = rng.randint(0, len(vocab) - 24)
                base = vocab[start:start + 24]
                # swap a random suffix for fresh words so overlaps vary
                cut = rng.randint(0, 12)
                tail = [f"f{next_id:03d}{j:02d}" for j in range(cut)]
                text = " ".join(base[: 24 - cut] + tail)
                docs.append((next_id, "web", text))
                texts[next_id] = text
                next_id += 1
            batch = spark.createDataFrame(
                docs, "doc_id bigint, source string, text string"
            )
            jobs.corpus_apply_ingest_batch(batch, batch_id, corpus_dir, _BENCH)

        dec = _decisions(spark, corpus_dir)
        flagged = [
            (d, r["near_match_id"]) for d, r in dec.items() if r["near_dup"]
        ]
        assert flagged, "fuzz corpus produced no near-dup flags; widen overlaps"
        for d, m in flagged:
            j = jac(texts[d], texts[m])
            assert j >= ND_JACCARD_T, (
                f"seed {seed}: doc {d} flagged near-dup of {m} but exact "
                f"3-gram Jaccard is {j:.3f} < {ND_JACCARD_T}"
            )


def test_corpus_compaction_preserves_shingle_state(spark, tmp_path):
    """The budget-bounded shingle sets must survive compaction into the
    ingest_batch=-1 base: verify with the borderline pair, which ONLY
    the exact path flags (sig-agree 0.4375 < 0.5) — if compaction
    dropped or nulled `s`, the gate would silently fall back to the
    estimate and accept the near-dup, and every other compaction test
    would still pass (their pairs are strong overlaps both verifies
    catch)."""
    corpus_dir = str(tmp_path / "corpus")
    texts = {1: _TEXT_A, 11: _TEXT_H,
             21: " ".join(f"cp{i:02d}" for i in range(24))}
    for b, (doc_id, t) in enumerate(texts.items()):
        batch = spark.createDataFrame(
            [(doc_id, "web", t)], "doc_id bigint, source string, text string"
        )
        jobs.corpus_apply_ingest_batch(batch, b, corpus_dir, _BENCH)
    rep = jobs.corpus_compact_index(spark, corpus_dir)  # absorbs 0-1
    assert rep["compacted_batches"] == [0, 1]
    base = spark.read.parquet(
        os.path.join(corpus_dir, "index", "ingest_batch=-1")
    )
    srow = {r["doc_id"]: r["s"] for r in base.select("doc_id", "s").collect()}
    assert srow[1] is not None and len(srow[1]) > 0

    b = spark.createDataFrame(
        [(2, "web", _TEXT_B_BORDERLINE)],
        "doc_id bigint, source string, text string",
    )
    jobs.corpus_apply_ingest_batch(b, 3, corpus_dir, _BENCH)
    dec = _decisions(spark, corpus_dir)
    assert dec[2]["near_dup"] is True and dec[2]["near_match_id"] == 1
    assert dec[2]["accept"] is False


def test_stale_lock_reclaim_is_rename_atomic(spark, tmp_path):
    """Two maintenance jobs that both observe the SAME expired lock
    must never both proceed.  Round 12 made the reclaim claim the
    stale lock by an atomic RENAME to a run-unique name (rename fails
    once the source is gone), replacing delete-then-create, which
    admitted both: A deletes and re-acquires; B then deletes A's FRESH
    lock and acquires too.  Simulate both racers past the staleness
    check, then show exactly one rename wins."""
    root = str(tmp_path / "index")
    os.makedirs(root)
    lock_py = os.path.join(root, "_compact_lock")
    with open(lock_py, "w") as f:
        f.write('{"run_id": "crashed-run"}')
    stale = time.time() - 7200.0
    os.utime(lock_py, (stale, stale))
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    lock = jvm_path(root + "/_compact_lock")
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())

    assert jobs._reclaim_stale_lock(
        fs, jvm_path, lock, 3600.0, "racer-a"
    ) is True
    # B's rename has no source left -> loses, touches nothing
    assert jobs._reclaim_stale_lock(
        fs, jvm_path, lock, 3600.0, "racer-b"
    ) is False
    assert not os.path.exists(lock_py)
    assert os.listdir(root) == [], "no tombstone litter"


def test_stale_lock_reclaim_restores_stolen_fresh_lock(spark, tmp_path):
    """The reclaim's claim is CONDITIONAL, not just atomic: a loser
    whose rename lands AFTER the winner already re-created captures
    the winner's FRESH lock (rename takes whatever is at the path).
    The post-capture mtime verify must detect that, rename the fresh
    lock straight back intact, and report the reclaim lost."""
    root = str(tmp_path / "index")
    os.makedirs(root)
    lock_py = os.path.join(root, "_compact_lock")
    # the winner's freshly created lock (current mtime)
    with open(lock_py, "w") as f:
        f.write('{"run_id": "rename-winner"}')
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    lock = jvm_path(root + "/_compact_lock")
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())

    assert jobs._reclaim_stale_lock(
        fs, jvm_path, lock, 3600.0, "late-loser"
    ) is False
    assert os.path.exists(lock_py), "stolen fresh lock must be restored"
    with open(lock_py) as f:
        assert json.load(f)["run_id"] == "rename-winner"
    assert os.listdir(root) == ["_compact_lock"], "no capture litter"


def test_maintenance_lock_reclaim_loser_refuses(spark, tmp_path, monkeypatch):
    """The _maintenance_lock path for a reclaimer that LOSES the rename
    race: with the winner's lock on the path it must raise without
    entering the context and without touching the winner's progress
    (the pre-round-12 form would delete-and-recreate its way past the
    winner here).  With the path simply VACANT (the holder released
    between the failed create and the stat), the atomic create is the
    real admission gate and the job proceeds."""
    import pytest

    root = str(tmp_path / "index")
    os.makedirs(root)
    lock_py = os.path.join(root, "_compact_lock")
    with open(lock_py, "w") as f:
        f.write('{"run_id": "crashed-run"}')
    stale = time.time() - 7200.0
    os.utime(lock_py, (stale, stale))

    monkeypatch.setattr(jobs, "_reclaim_stale_lock", lambda *a: False)
    entered = []
    with pytest.raises(RuntimeError, match="reclaimed the stale lock first"):
        with jobs._maintenance_lock(spark, root, 3600.0, "test-job"):
            entered.append(True)
    assert not entered, "loser must never enter the context"
    assert os.path.exists(lock_py), "loser must not touch the lock path"

    # benign vacancy: the reclaim loses but the path is CLEAR (the
    # rename winner hasn't re-created yet, or the holder released) ->
    # the atomic create is the admission gate and the job proceeds
    # (exactly-one still holds: the rename winner's later create
    # would fail against ours and raise)
    os.utime(lock_py, (stale, stale))

    def vacating_reclaim(*a):
        os.remove(lock_py)
        return False

    monkeypatch.setattr(jobs, "_reclaim_stale_lock", vacating_reclaim)
    with jobs._maintenance_lock(spark, root, 3600.0, "test-job"):
        entered.append(True)
    assert entered == [True]
    assert not os.path.exists(lock_py), "released on exit"


def test_release_capture_restores_foreign_lock(spark, tmp_path):
    """_capture_release_owned is the race-safe core of the release: if
    the payload turns out FOREIGN after the atomic capture (a reclaimer
    rewrote the lock between the caller's ownership read and the
    rename), the lock must be renamed BACK intact — never deleted, the
    TOCTOU of a read-then-delete release."""
    root = str(tmp_path / "index")
    os.makedirs(root)
    lock_py = os.path.join(root, "_compact_lock")
    with open(lock_py, "w") as f:
        f.write('{"run_id": "reclaimer-run"}')
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    lock = jvm_path(root + "/_compact_lock")
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())

    jobs._capture_release_owned(spark, fs, jvm_path, lock, "outlived-run")
    assert os.path.exists(lock_py), "foreign lock must be restored"
    with open(lock_py) as f:
        assert json.load(f)["run_id"] == "reclaimer-run"
    assert os.listdir(root) == ["_compact_lock"], "no capture litter"

    # with OUR payload the capture deletes it -- the normal release
    with open(lock_py, "w") as f:
        f.write('{"run_id": "outlived-run"}')
    jobs._capture_release_owned(spark, fs, jvm_path, lock, "outlived-run")
    assert os.listdir(root) == []


def test_maintenance_sweeps_skip_foreign_partition_dirs(spark, tmp_path):
    """A non-integer ingest_batch= dir (a stray hand-made dir or a
    __HIVE_DEFAULT_PARTITION__) is by definition foreign -- the gate
    only writes integer ids.  Both maintenance sweeps must SKIP it,
    not abort mid-lock with a ValueError, and must leave it in place
    (not maintenance's to delete)."""
    corpus_dir = str(tmp_path / "corpus")
    _ingest_three_batches(spark, corpus_dir)
    foreign = "ingest_batch=__HIVE_DEFAULT_PARTITION__"
    foreign_dec = os.path.join(corpus_dir, "decisions", foreign)
    foreign_idx = os.path.join(corpus_dir, "index", foreign)
    os.makedirs(foreign_dec)
    os.makedirs(foreign_idx)

    rep = jobs.corpus_decisions_retain(spark, corpus_dir, keep_batches=1)
    assert rep["deleted_batches"] == [0, 1]
    assert rep["kept_batches"] == [2]
    assert os.path.isdir(foreign_dec), "foreign dir must survive retention"

    rep = jobs.corpus_compact_index(spark, corpus_dir)
    assert rep["compacted_batches"] == [0, 1]
    assert os.path.isdir(foreign_idx), "foreign dir must survive compaction"
    assert not os.path.exists(
        os.path.join(corpus_dir, "index", "_compact_lock")
    )


class _FaultyFS:
    """Delegating proxy over a real Hadoop FileSystem that raises from
    one named method — the minimal transient-FS-failure injector for
    the lock helpers (they take ``fs`` as a plain argument, so no
    monkeypatching of py4j objects is needed)."""

    def __init__(self, real, fail_method):
        self._real = real
        self._fail = fail_method

    def __getattr__(self, name):
        if name == self._fail:
            def boom(*a, **k):
                raise RuntimeError(f"injected transient {name} failure")
            return boom
        return getattr(self._real, name)


def test_stale_lock_reclaim_unstattable_capture_restores(spark, tmp_path):
    """A capture whose post-rename stat FAILS must be treated like a
    captured fresh lock — renamed back, reclaim reported lost — not
    deleted as 'stale'.  The pre-round-13 form (stat failure => age
    inf => stale) was the one path that failed toward DOUBLE
    admission: a transient stat failure on a winner's fresh lock
    deleted the live lock and admitted a second maintenance job."""
    root = str(tmp_path / "index")
    os.makedirs(root)
    lock_py = os.path.join(root, "_compact_lock")
    with open(lock_py, "w") as f:
        f.write('{"run_id": "rename-winner"}')  # a live, FRESH lock
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    lock = jvm_path(root + "/_compact_lock")
    fs = _FaultyFS(
        lock.getFileSystem(spark._jsc.hadoopConfiguration()),
        "getFileStatus",
    )

    assert jobs._reclaim_stale_lock(
        fs, jvm_path, lock, 3600.0, "stat-blind"
    ) is False
    assert os.path.exists(lock_py), "unstattable capture must be restored"
    with open(lock_py) as f:
        assert json.load(f)["run_id"] == "rename-winner"
    assert os.listdir(root) == ["_compact_lock"], "no capture litter"


def test_release_capture_owned_delete_failure_is_swallowed(spark, tmp_path):
    """_capture_release_owned runs from _maintenance_lock's finally: a
    transient failure of the owned-path delete must NOT raise (it would
    mask the context body's real exception).  The orphaned capture sits
    at a run-unique .release.<run_id> name nothing re-reads — inert."""
    root = str(tmp_path / "index")
    os.makedirs(root)
    lock_py = os.path.join(root, "_compact_lock")
    with open(lock_py, "w") as f:
        f.write('{"run_id": "our-run"}')
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    lock = jvm_path(root + "/_compact_lock")
    fs = _FaultyFS(
        lock.getFileSystem(spark._jsc.hadoopConfiguration()), "delete"
    )

    jobs._capture_release_owned(spark, fs, jvm_path, lock, "our-run")
    assert not os.path.exists(lock_py), "lock path must be vacated"
    assert os.listdir(root) == ["_compact_lock.release.our-run"], (
        "failed delete leaves exactly the inert orphaned capture"
    )
