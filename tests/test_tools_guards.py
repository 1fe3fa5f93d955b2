"""Guard-rail tests for the bench tooling (no Spark session needed).

tools/ is not a package; load the module by path.  Pins the round-12
ADVICE fixes: the pre-flight sf guard matches update_baseline.py's
threshold (<= 0, so a '.../sf0' dir fails BEFORE burning a bench run),
and _sf_of reports unparseable dirs as -1.0 instead of crashing on a
digit-free regex match like '.../sf.'.
"""

from __future__ import annotations

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, "tools", name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sf_of_parses_and_never_raises():
    bt = _load("bench_targeted")
    assert bt._sf_of("/root/testdata/sf0.1") == 0.1
    assert bt._sf_of("/root/testdata/sf0.01/") == 0.01
    # digit-free match: the regex admits 'sf.' but float('.') raises --
    # must report unparseable, not crash
    assert bt._sf_of("/data/sf.") == -1.0
    assert bt._sf_of("/data/nothing") == -1.0
    # sf0 parses to 0.0 -- the <= 0 pre-flight is what rejects it
    assert bt._sf_of("/data/sf0") == 0.0


def test_preflight_threshold_matches_update_baseline(monkeypatch):
    """A '.../sf0' dir must fail bench_targeted's pre-flight (sf <= 0),
    not pass it and get refused only at baseline-update time after a
    full min-of-3 run."""
    import pytest

    bt = _load("bench_targeted")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/data/sf0")
    monkeypatch.setattr("sys.argv", ["bench_targeted.py", "events_hourly"])
    with pytest.raises(SystemExit, match="positive scale factor"):
        bt.main()
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/data/sf.")
    with pytest.raises(SystemExit, match="positive scale factor"):
        bt.main()


def test_bench_ratios_parses_correct_columns(tmp_path, monkeypatch, capsys):
    """bench_ratios must compare against the SECONDS column (3), not
    the sf column (2) — the exact hand-rolled mistake that motivated
    the tool — and must classify the 2x / 1.5x tiers and coverage
    gaps correctly."""
    import json as _json

    import pytest

    br = _load("bench_ratios")
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text(
        "# BASELINE\n"
        "| Metric | Value | Config | Source |\n"
        "|---|---|---|---|\n"
        "| Reference published benchmark | none exists | — | prose |\n"
        "\n"
        "| q_fast | 0.1 | 1.00 | 2026-08-14 | note |\n"
        "| q_slow | 0.1 | 2.00 | 2026-08-14 | note |\n"
        "| q_watch | 0.1 | 1.00 | 2026-08-14 | note |\n"
        "| q_only_base | 0.1 | 1.00 | 2026-08-14 | note |\n"
    )
    bench = tmp_path / "bench.json"
    bench.write_text(_json.dumps({
        "sf": 0.1,
        "queries": {
            "q_fast": 0.5,       # 0.5x
            "q_slow": 5.0,       # 2.5x -> over_2x
            "q_watch": 1.8,      # 1.8x -> over_1p5x
            "q_only_bench": 1.0,
        },
    }))
    monkeypatch.setattr(br, "REPO", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["bench_ratios.py", str(bench)])
    with pytest.raises(SystemExit) as e:
        br.main()
    assert e.value.code == 1  # over-2x present gates the exit status
    out = capsys.readouterr().out
    payload = _json.loads(out.strip().splitlines()[-1])
    assert payload["n"] == 3
    assert payload["over_2x"] == {"q_slow": 2.5}
    assert payload["over_1p5x"] == {"q_watch": 1.8}
    assert payload["median"] == 1.8
    assert payload["missing_in_bench"] == ["q_only_base"]
    assert payload["missing_in_baseline"] == ["q_only_bench"]
    # the sf column (0.1) must never be the denominator: q_fast at
    # 0.5 s vs a 1.00 s row is 0.5x, not 5x
    assert "q_fast" not in payload["over_2x"]


def test_bench_ratios_clean_pass_exits_zero(tmp_path, monkeypatch, capsys):
    import json as _json

    import pytest

    br = _load("bench_ratios")
    (tmp_path / "BASELINE.md").write_text(
        "| q1 | 0.1 | 1.00 | 2026-08-14 | note |\n"
    )
    bench = tmp_path / "bench.json"
    bench.write_text(_json.dumps({"queries": {"q1": 0.9}}))
    monkeypatch.setattr(br, "REPO", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["bench_ratios.py", str(bench)])
    with pytest.raises(SystemExit) as e:
        br.main()
    assert e.value.code == 0
    assert "over 2x (0)" in capsys.readouterr().out


def test_bench_ratios_reads_driver_wrapper_shape(tmp_path, monkeypatch, capsys):
    """The driver's BENCH_rN.json nests the bench stdout JSON under
    'parsed' — the reader must unwrap it."""
    import json as _json

    import pytest

    br = _load("bench_ratios")
    (tmp_path / "BASELINE.md").write_text(
        "| q1 | 0.1 | 1.00 | 2026-08-14 | note |\n"
    )
    bench = tmp_path / "BENCH_r99.json"
    bench.write_text(_json.dumps({
        "n": 99, "rc": 0, "sf": 0.1,
        "parsed": {"queries": {"q1": 0.8}, "sf": 0.1},
    }))
    monkeypatch.setattr(br, "REPO", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["bench_ratios.py", str(bench)])
    with pytest.raises(SystemExit) as e:
        br.main()
    assert e.value.code == 0
    assert '"n": 1' in capsys.readouterr().out


def test_bench_ratios_reports_excluded_unratioable_rows(
    tmp_path, monkeypatch, capsys
):
    """A query present on BOTH sides but unratioable — an errored
    (negative) bench time or a non-positive baseline row — must appear
    in the 'excluded' output, not silently vanish from every list: a
    dropped errored query would otherwise read as a clean pass."""
    import json as _json

    import pytest

    br = _load("bench_ratios")
    (tmp_path / "BASELINE.md").write_text(
        "| q_ok | 0.1 | 1.00 | 2026-08-14 | note |\n"
        "| q_errored | 0.1 | 1.00 | 2026-08-14 | note |\n"
        "| q_zero_base | 0.1 | 0.00 | 2026-08-14 | note |\n"
    )
    bench = tmp_path / "bench.json"
    bench.write_text(_json.dumps({"queries": {
        "q_ok": 0.9,
        "q_errored": -1.0,     # the error sentinel
        "q_zero_base": 1.0,    # fine bench time, unratioable baseline
    }}))
    monkeypatch.setattr(br, "REPO", str(tmp_path))
    monkeypatch.setattr("sys.argv", ["bench_ratios.py", str(bench)])
    with pytest.raises(SystemExit) as e:
        br.main()
    assert e.value.code == 0  # exit still gates on over-2x only
    out = capsys.readouterr().out
    assert "EXCLUDED" in out
    payload = _json.loads(out.strip().splitlines()[-1])
    assert payload["n"] == 1
    assert sorted(payload["excluded"]) == ["q_errored", "q_zero_base"]
    assert payload["excluded"]["q_errored"] == {
        "baseline": 1.0, "bench": -1.0,
    }
    assert payload["missing_in_bench"] == []
    assert payload["missing_in_baseline"] == []


def test_memoized_index_set_is_frozen():
    """The managed_persist/managed_lookup site-key inventory is FROZEN
    (r13 verdict item 8; protocol in bench.py's docstring): a new site
    moves work out of the bench's min-of-3 into pass 1, so adding one
    requires updating this list AND appending the one-line
    justification to bench.py's memoized-index protocol note."""
    import re

    frozen = {
        "containment:postings",
        "cooccur_pmi:pair_counts",
        "dedup_clusters:labels",
        "dedup_lsh_frontier:cand{r}",
        "dedup_lsh_frontier:mh",
        "dedup_lsh_frontier:verified",
        "doc_sparse_cosine:weights",
        "forecast_backtest_mase:daily",
        "graph_assortativity:sym",
        "knn_ivf:assign",
        "knn_lsh:buckets",
        "knn_pq_adc:packed",
        "knn_pq_adc:vecl",
        "minhash:bands",
        "minhash:shingles",
        "ml_confusion_matrix:pred",
        "multimodal_phash_dedup:hashes",
        "ngram_jaccard:shingles",
        "orders_segment_migration:per",
        "retrieval_mrr_audit:tf",
        "substring_spans:grams",
        "t_closeness_audit:cell",
        "text_ngram_novelty:grams",
        "ts_decompose_classical:det",
        "ts_decompose_classical:hourly",
    }
    pkg = os.path.join(_REPO, "kafka_hadoop_loader_spark")
    found = set()
    pat = re.compile(
        r'managed_(?:persist|lookup)\(\s*f"([^"]+):\{sf_dir\}"', re.S
    )
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            src = open(os.path.join(root, fname)).read()
            calls = len(
                re.findall(r"(?<!def )managed_(?:persist|lookup)\(", src)
            )
            keys = pat.findall(src)
            # every call site must use the f"prefix:{sf_dir}" key shape
            # (or this inventory can't see it)
            assert calls == len(keys), (
                f"{fname}: {calls} managed_persist/lookup calls but only "
                f"{len(keys)} parseable f\"...:{{sf_dir}}\" keys"
            )
            found.update(keys)
    assert found == frozen, (
        f"memoized-index set changed: added={sorted(found - frozen)} "
        f"removed={sorted(frozen - found)} — see bench.py's frozen-set "
        "protocol note before touching this list"
    )
