"""Deeper checks of the LLM-data operators beyond oracle parity:
MinHash-LSH equals exhaustive ground truth, SimHash recall, ANN recall
vs brute force, approx-distinct error bound, multimodal plumbing."""

from __future__ import annotations

import pytest

from kafka_hadoop_loader_spark import registry
from tests.conftest import SF_DIR

REG = registry.load_all()


@pytest.fixture(scope="module")
def truth_pairs(spark):
    """Ground-truth near-dup pairs: word-3gram Jaccard >= 0.5 (exhaustive)."""
    rows = REG["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()  # lsh side
    return {(r.doc_id_a, r.doc_id_b): r.jaccard for r in rows}


def test_minhash_equals_exhaustive(spark, duck):
    lsh = {
        (r.doc_id_a, r.doc_id_b)
        for r in REG["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    }
    exhaustive = {
        (a, b)
        for a, b in duck.execute(
            """
            WITH t AS (SELECT doc_id, string_split(text,' ') w FROM documents),
            sh AS (SELECT doc_id, list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
                     for i in generate_series(1,len(w)-2)]) s FROM t WHERE len(w)>=3)
            SELECT a.doc_id, b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s,b.s))::DOUBLE/len(list_distinct(a.s||b.s)) >= 0.5
            """
        ).fetchall()
    }
    assert lsh == exhaustive


def test_simhash_recall_and_precision(spark, truth_pairs):
    found = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in REG["dedup_simhash"].fn(spark, SF_DIR).collect()
    }
    if not truth_pairs:
        pytest.skip("no ground-truth near-dup pairs at this SF")
    recall = len(set(found) & set(truth_pairs)) / len(truth_pairs)
    assert recall >= 0.6  # simhash targets tighter similarity than j>=0.5
    # no wild false positives: everything found is a true near-dup
    assert set(found) <= set(truth_pairs)


def test_ann_lsh_recall(spark):
    brute = REG["knn_cosine_bruteforce"].fn(spark, SF_DIR).collect()
    ann = REG["knn_cosine_lsh"].fn(spark, SF_DIR).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in ann:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # fixture vectors are near-random


def test_approx_distinct_error(spark, duck):
    rows = REG["approx_distinct"].fn(spark, SF_DIR).collect()
    exact = dict(
        duck.execute(
            "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        assert r.n_custs_exact == exact[r.o_orderpriority]
        assert r.approx_within_5pct, f"{r.o_orderpriority}: HLL estimate drifted >5%"


def test_multimodal_decode_plumbing(spark):
    df = REG["multimodal_decode"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    r0 = rows[0]
    assert r0.decoder == "stub-v1"
    assert len(r0.feature_csv.split(",")) == 8
    assert 0 < r0.mean_byte < 255
    assert r0.payload_bytes > 0
    # deterministic: second run bit-identical
    again = df.collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_centroid_invariants(spark):
    rows = REG["embedding_label_centroid_dist"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10  # one per label
    for r in rows:
        assert r.n_vecs > 0
        assert 0.0 < r.mean_dist <= r.max_dist


def test_ivf_recall_vs_bruteforce(spark):
    from kafka_hadoop_loader_spark import registry

    reg = registry.load_all()
    bf = {
        (r.query_id, r.neighbor_id)
        for r in reg["knn_cosine_bruteforce"].fn(spark, SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in reg["knn_cosine_ivf"].fn(spark, SF_DIR).collect()
    }
    assert len(ivf & bf) / len(bf) >= 0.4


def test_hash_split_proportions_and_determinism(spark):
    rows = REG["sample_hash_split"].fn(spark, SF_DIR).collect()
    n = len(rows)
    frac = {s: sum(1 for r in rows if r.split == s) / n for s in ("train", "val", "test")}
    # hash buckets approximate 80/10/10; wide tolerance at fixture size
    assert 0.68 <= frac["train"] <= 0.92, frac
    assert frac["val"] + frac["test"] == pytest.approx(1 - frac["train"])
    # determinism: re-running yields the identical assignment
    again = REG["sample_hash_split"].fn(spark, SF_DIR).collect()
    assert [(r.doc_id, r.split) for r in rows] == [(r.doc_id, r.split) for r in again]


def test_pack_sequences_invariants(spark):
    rows = REG["pack_sequences"].fn(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        # offsets are the exclusive prefix sum of token counts in doc order
        off = 0
        for r in sorted(rs, key=lambda r: r.doc_id):
            assert r.tok_offset == off, (src, r.doc_id)
            off += r.n_tokens
            # sequence span covers exactly the doc's token interval
            assert r.seq_first == r.tok_offset // 256
            assert r.seq_last == (r.tok_offset + r.n_tokens - 1) // 256
            assert r.n_seqs == r.seq_last - r.seq_first + 1


def test_decontaminate_flags_planted_duplicates(spark, duck):
    """Exact-duplicate docs of a benchmark doc must be flagged with full
    overlap (the fixture plants exact text dups — dedup_exact's basis)."""
    flagged = {r.doc_id: r for r in REG["decontaminate_ngram"].fn(spark, SF_DIR).collect()}
    dups = duck.execute(
        """
        SELECT a.doc_id FROM documents a JOIN documents b ON a.text = b.text
        WHERE b.doc_id % 97 = 0 AND a.doc_id % 97 <> 0
          AND len(string_split(a.text, ' ')) >= 3
        """
    ).fetchall()
    for (doc_id,) in dups:
        assert doc_id in flagged, f"exact dup of benchmark doc {doc_id} not flagged"


def test_pii_redact_removes_all_pii(spark):
    rows = REG["pii_redact"].fn(spark, SF_DIR).collect()
    assert all(r.n_emails >= 1 and r.n_phones >= 1 for r in rows)
    assert all("@" not in r.redacted for r in rows)
    assert all("<EMAIL>" in r.redacted and "<PHONE>" in r.redacted for r in rows)


def test_quality_gate_both_outcomes(spark):
    rows = REG["quality_gate"].fn(spark, SF_DIR).collect()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows), "thresholds must discriminate"
    for r in rows:
        assert r.keep == (
            r.pass_len and r.pass_word_len and r.pass_diversity and r.pass_stopwords
        )


def test_kmeans_improves_over_iterations(spark):
    # Algorithmic sanity beyond hash parity: total inertia after the
    # second Lloyd iteration must not exceed the first iteration's
    # (k-means monotonically decreases within-cluster SSE; the integer
    # floor-mean can differ from the true mean by <1 grid unit per dim,
    # far below the observed inertia gap).
    import kafka_hadoop_loader_spark.operators.ml as ml
    from kafka_hadoop_loader_spark.catalog import table
    from pyspark.sql import Window, functions as F

    emb = table(spark, SF_DIR, "embeddings")
    longv = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "val")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        (F.round(F.col("val").cast("double") * ml._SCALE).cast("long") + ml._OFFSET).alias("v"),
    )
    seeds = (
        emb.select("vec_id").orderBy("vec_id").limit(ml._K)
        .select("vec_id", (F.row_number().over(Window.orderBy("vec_id")) - 1)
                .cast("long").alias("cid"))
    )
    cent = seeds.join(longv, "vec_id").select("cid", "dim", F.col("v").alias("c"))
    inertias = []
    for _ in range(2):
        dist = (
            longv.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist2"))
        )
        wv = Window.partitionBy("vec_id").orderBy("dist2", "cid")
        assign = (
            dist.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1).select("vec_id", "cid", "dist2")
        )
        inertias.append(assign.agg(F.sum("dist2")).collect()[0][0])
        cent = (
            assign.select("vec_id", "cid").join(longv, "vec_id")
            .groupBy("cid", "dim")
            .agg(F.expr("CAST(SUM(v) AS BIGINT) DIV CAST(COUNT(*) AS BIGINT)").alias("c"))
        )
    assert inertias[1] <= inertias[0]


def test_kmeans_covers_all_vectors(spark):
    rows = REG["kmeans_embeddings"].fn(spark, SF_DIR).collect()
    from kafka_hadoop_loader_spark.catalog import table

    n_vec = table(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vec
    assert len(rows) <= 8 and all(r.n_vecs > 0 for r in rows)


def test_bpe_merges_reduce_symbol_count(spark):
    # After 2 merges the weighted total symbol count must be strictly
    # below the raw character count (each applied merge replaces two
    # symbols with one somewhere in the corpus), and every learned
    # symbol must be a substring of some word.
    from kafka_hadoop_loader_spark.catalog import table
    from pyspark.sql import functions as F

    d = table(spark, SF_DIR, "documents")
    n_chars_no_space = d.select(
        F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("n")
    ).collect()[0].n
    rows = REG["bpe_train_merges"].fn(spark, SF_DIR).collect()
    assert any(len(r.symbol) >= 2 for r in rows), "no merged symbol surfaced"
    total_after = sum(r.n_occurrences for r in rows)
    # top-20 is a subset, so the subset total must be < the char total
    assert total_after < n_chars_no_space


def test_hll_estimate_within_bound(spark):
    # Standard HLL relative error is ~1.04/sqrt(m) = 13% at m=64; allow
    # 3 sigma.  The estimate is deterministic (portable hashes), so this
    # is a fixed property of the fixture, not a flaky statistical test.
    row = REG["sketch_hll_distinct"].fn(spark, SF_DIR).collect()[0]
    assert abs(row.hll_estimate - row.n_true) / row.n_true < 0.40


def test_cms_overestimate_guarantee(spark):
    rows = REG["sketch_cms_heavy_hitters"].fn(spark, SF_DIR).collect()
    assert rows and all(r.overcount >= 0 for r in rows)
    assert all(r.est_cnt >= r.true_cnt for r in rows)


def test_pq_adc_recall(spark):
    """PQ/ADC+refine recovers most of the exact L2 top-5 (PQ quantizes
    L2 distance, so L2 — not cosine — is its ground truth).  Exact-
    integer arithmetic makes this deterministic: recall is a fixed
    number for the fixture (0.7), not a distribution."""
    import numpy as np
    import pyarrow.parquet as pq_

    from kafka_hadoop_loader_spark import registry
    from tests.conftest import SF_DIR

    reg = registry.load_all()
    pq = reg["knn_pq_adc"].fn(spark, SF_DIR).collect()
    tab = pq_.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    V = np.vstack(tab["embedding"].to_numpy()).astype(np.float64)
    ids = tab["vec_id"].to_numpy()
    order = np.argsort(ids)
    V, ids = V[order], ids[order]
    recalls = []
    for q in range(10):
        d = ((V - V[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        top5 = set(ids[np.argsort(d)[:5]])
        got = {r.neighbor_id for r in pq if r.query_id == q}
        recalls.append(len(got & top5) / 5)
    assert sum(recalls) / len(recalls) >= 0.5


def test_connected_components_match_union_find(spark):
    """graph_connected_components' 6 unrolled large/small-star rounds
    must land on the TRUE components (fixpoint measured at <= 5 rounds
    on every fixture; the 6th is the spare) — verified against a
    union-find ground truth built from the same min-support edge set."""
    from kafka_hadoop_loader_spark.operators.graph import (
        _CC_MIN_SUPPORT,
        graph_connected_components,
    )
    import duckdb

    got = {
        (r.part_id, r.component_id, r.comp_size)
        for r in graph_connected_components(spark, SF_DIR).collect()
    }

    edges = duckdb.sql(f"""
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM read_parquet('{SF_DIR}/lineitem.parquet') a
        JOIN read_parquet('{SF_DIR}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY u, v
        HAVING COUNT(DISTINCT a.l_orderkey) >= {_CC_MIN_SUPPORT}
    """).fetchall()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id in component (what star rounds yield)
    roots: dict[int, list[int]] = {}
    for x in parent:
        roots.setdefault(find(x), []).append(x)
    want = set()
    for members in roots.values():
        label, size = min(members), len(members)
        for m in members:
            want.add((m, label, size))
    assert got == want


def test_ann_recall_audit_floors(spark):
    """Recall@K per method is a fixed deterministic number for the
    fixture (integer bucket keys, exact fold cosine).  Floors mirror
    the per-method floors and [0, 1] bounds.  Measured means at
    sf0.001: lsh 0.585, ivf 0.495 (near-random fixture vectors bound
    any ANN method's recall; see knn_cosine_lsh docstring)."""
    rows = REG["ann_recall_audit"].fn(spark, SF_DIR).collect()
    assert {r.method for r in rows} == {"lsh", "ivf"}
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)
    floors = {"lsh": 0.5, "ivf": 0.45}
    for method, floor in floors.items():
        rs = [r.recall_at_k for r in rows if r.method == method]
        assert sum(rs) / len(rs) >= floor, method


def test_hard_negatives_are_cross_label_topk(spark):
    rows = REG["sample_hard_negatives"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.query_label != r.neighbor_label for r in rows)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_perplexity_proxy_bits_nonnegative_and_bounded(spark):
    rows = REG["text_perplexity_proxy"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_tokens >= 1
        assert 0 <= r.surprisal_bits
        # bits/token can't exceed log2(N): a token occurring once has
        # surprisal floor(log2(N)); N fixture-wide is < 2^24
        assert 0.0 <= r.bits_per_token < 24.0


def test_tdigest_envelope_and_merge_bound(spark):
    """The registered query's envelope booleans are all TRUE, and the
    merged digest respects the compression bound (mergeability is the
    point of the sketch)."""
    rows = REG["quantiles_tdigest"].fn(spark, SF_DIR).collect()
    assert rows and all(r.within_rank_envelope for r in rows)
    # pure-sketch property: merging bucket digests then compressing
    # never exceeds the delta centroid budget
    import numpy as np

    from kafka_hadoop_loader_spark.operators.sketch import (
        _TD_DELTA,
        _td_compress,
    )

    rng = np.random.default_rng(7)
    parts = [np.sort(rng.normal(size=5000)) for _ in range(8)]
    cents = []
    for v in parts:
        m, w = _td_compress(v, [1.0] * len(v), float(len(v)), _TD_DELTA)
        assert len(m) <= 2 * _TD_DELTA  # total/delta weight floor
        cents.extend(zip(m, w))
    cents.sort()
    means = [m for m, _ in cents]
    weights = [w for _, w in cents]
    m, w = _td_compress(means, weights, float(sum(weights)), _TD_DELTA)
    assert len(m) <= 2 * _TD_DELTA
    assert abs(sum(w) - 40000.0) < 1e-6  # total weight conserved


def test_semantic_prune_drops_exactly_planted_dups(spark):
    rows = REG["dedup_semantic_prune"].fn(spark, SF_DIR).collect()
    dropped = {r.vec_id: r.dup_of for r in rows if not r.keep}
    kept = {r.vec_id for r in rows if r.keep}
    # every planted shifted id is dropped, attributed to its original
    originals = {r.vec_id for r in rows if r.vec_id < 100000}
    assert dropped == {v + 100000: v for v in originals}
    assert kept == originals


def test_normal_equations_match_numpy_lstsq(spark):
    """Cramer-on-exact-moments must agree with numpy's least squares on
    the same integer-grid observations (different algorithm, same
    minimizer) to float precision."""
    import duckdb
    import numpy as np

    rows = REG["regr_normal_equations"].fn(spark, SF_DIR).collect()
    obs = duckdb.sql(f"""
        SELECT l.l_returnflag,
               CAST(l.l_quantity AS BIGINT) AS q,
               CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS r,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS y
        FROM read_parquet('{SF_DIR}/lineitem.parquet') l
        JOIN read_parquet('{SF_DIR}/part.parquet') p
          ON l.l_partkey = p.p_partkey
    """).df()
    for row in rows:
        g = obs[obs["l_returnflag"] == row.returnflag]
        X = np.column_stack(
            [np.ones(len(g)), g["q"].to_numpy(float), g["r"].to_numpy(float)]
        )
        beta, *_ = np.linalg.lstsq(X, g["y"].to_numpy(float), rcond=None)
        got = np.array([row.beta0_cents, row.beta1_cents_per_unit, row.beta2])
        assert np.allclose(got, beta, rtol=1e-6), (row.returnflag, got, beta)


def test_capped_sessions_hard_caps_a_bot_session(spark):
    """The round-4 bound-in-code guarantee: a single never-idle actor
    (1500 events, 1s apart — one session) contributes at most
    _SESSION_ROW_CAP rows to any downstream collect_list group, and
    the kept rows are exactly the session's FIRST 1000 by (ts,
    event_id)."""
    from kafka_hadoop_loader_spark.operators.timeseries import (
        _SESSION_ROW_CAP,
        _capped_sessions,
    )

    recs = [(7, i, "x", 1_000_000 + i * 1_000_000) for i in range(1500)]
    df = spark.createDataFrame(
        recs, "user_id long, event_id long, event_type string, ts_us long"
    )
    rows = _capped_sessions(df).collect()
    assert len(rows) == _SESSION_ROW_CAP
    assert {r.sess_id for r in rows} == {1}
    assert sorted(r.event_id for r in rows) == list(range(_SESSION_ROW_CAP))


def test_lpa_communities_nest_inside_components(spark):
    """Cross-operator invariant: labels only propagate along edges, so
    every LPA community must be wholly contained in one connected
    component (the converse is false — LPA splits big components into
    dense clusters).  Also: community ids are node ids and sizes sum
    to the node count."""
    comp = {
        r.part_id: r.component_id
        for r in REG["graph_connected_components"].fn(spark, SF_DIR).collect()
    }
    rows = REG["graph_label_propagation"].fn(spark, SF_DIR).collect()
    assert {r.part_id for r in rows} == set(comp)
    by_comm: dict[int, set[int]] = {}
    for r in rows:
        assert r.community_id in comp  # labels are node ids
        by_comm.setdefault(r.community_id, set()).add(r.part_id)
    sizes = {r.community_id: r.community_size for r in rows}
    assert sum(sizes[c] for c in by_comm) == len(rows)
    for members in by_comm.values():
        assert len({comp[m] for m in members}) == 1


def test_star_clusters_equal_hashmin_clusters(spark):
    """dedup_clusters_star (fixed star-contraction rounds, no driver
    actions) must produce row-for-row the SAME clustering as
    dedup_clusters' converged hash-min loop — same edge graph, same
    component-min labels, two algorithms."""
    a = sorted(tuple(r) for r in REG["dedup_clusters"].fn(spark, SF_DIR).collect())
    b = sorted(
        tuple(r) for r in REG["dedup_clusters_star"].fn(spark, SF_DIR).collect()
    )
    assert a == b
