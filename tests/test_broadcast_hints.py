"""Broadcast-hint allowlist: every `F.broadcast(...)` in the package must
wrap a side that is BOUNDED — constant-size (literal frames, 1-row
aggregates, fixed grids), bounded-domain aggregates (per-segment /
per-bin / per-nation state), explicit top-k / limit outputs, or the
documented query-side / benchmark-slice doctrine sets.  SF-proportional
sides (customer, supplier, part, per-customer / per-user / per-doc
aggregates, corpus-derived id sets) must NOT carry a hint: at 100 TB a
forced broadcast of a data-proportional set exceeds the broadcast
ceiling and fails the job, while AQE picks broadcast from the measured
size whenever the side actually fits (the round-8/9 doctrine —
pipeline_corpus_build, pipeline_funnel, dedup_simhash, and the round-9
sweep over the TPC-H / ml / graph / stats / timeseries operators).

This test inventories every hint by (file, argument token) and compares
against the reviewed allowlist below.  Adding a new `F.broadcast` makes
it fail until the new site is reviewed for boundedness and added here;
removing one requires pruning the entry — either way the diff shows up
in review next to the code that changed.

The one deliberate proportional-looking entry: operators/joins.py `p`
(join_broadcast) is the explicit-hint OPERATOR DEMO — its docstring
carries the caveat that the pattern is only for caller-known-bounded
dims.
"""

from __future__ import annotations

import os
import re
from collections import Counter

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "kafka_hadoop_loader_spark")

# (relative path under the package) -> {argument token: count}
# Tokens are the first identifier inside F.broadcast( — enough to key a
# review because hint sites name their frames.
ALLOWED = {
    "operators/aggregates.py": {"best": 1},            # 1-row max
    "operators/dedup.py": {"b": 1, "cert": 1},         # per-source aggs; 1-row certificate
    "operators/graph.py": {"cert": 2, "exp": 1, "imp": 1, "n_nodes": 1},  # |nations| rollups; 1-row certs
    "operators/joins.py": {"bands": 1, "days": 1, "p": 1},  # literal bands; calendar days; OPERATOR DEMO (see module doc)
    "operators/layout.py": {"g": 1},                   # 1-row min/max
    "operators/ml.py": {
        "betas": 4, "cent": 1, "dom": 1, "g": 1, "iso": 2, "ivl": 1,
        "l1": 1, "l2": 1, "l3": 1, "m": 1, "model": 2, "p": 1, "pk": 1,
        "pm": 1, "prev": 1, "q": 1, "seg": 1, "tot": 1,
    },  # per-segment/per-bin/per-class model state; 1-row domains
    "operators/pipeline.py": {"bands": 1, "bench": 3, "target": 1, "tot": 3},
    # bench = benchmark-slice doctrine (bounded in production); rest 1-row / per-band
    "operators/profile.py": {"tot": 1},
    "operators/quality.py": {"bounds": 2, "census": 1, "mode": 1, "n": 1, "tot": 3},
    "operators/search.py": {
        "a": 1, "b": 1, "df": 2, "dfs": 1, "n_docs": 2, "nd": 2,
        "qterms": 1, "tot": 1,
    },  # unigram-vocabulary Heaps-law sides; 1-row totals; query-set doctrine
    "operators/similarity.py": {
        "cent": 3, "ctab": 1, "hits": 1, "nps": 1, "nv": 1, "q": 5,
        "qd": 1, "shards": 1, "shortlist": 1,
    },  # bounded query sides (vec_id < N_QUERIES), codebooks, literal grids
    "operators/sketch.py": {"cms": 1, "env": 1, "ex": 1, "sb": 1, "su": 1, "truth": 1},
    "operators/spatial.py": {"c1": 1, "cent": 1, "cert": 1, "ci": 1,
                             "d": 1, "d2": 1, "rect_cells": 1},
    "operators/stats.py": {
        "anchor": 1, "bloom": 2, "bounds": 2, "cuts": 1, "facs": 1,
        "med": 1, "medn": 1, "medr": 1, "mx": 1, "n": 1, "n_orders": 1,
        "sa": 1, "sb": 1, "sorted_ms": 1, "tot": 2,
    },  # 64-word bloom; 1-row medians/anchors; per-bucket counts
    "operators/textstats.py": {"btot": 1, "cnt": 1, "cont": 1, "n": 1, "n_total": 1},
    "operators/timeseries.py": {
        "bounds": 5, "lags": 1, "mad": 1, "med": 1, "q": 2, "qnorm": 1,
        "qvec": 1, "seas": 1, "span": 1, "tot": 1,
    },  # 1-row bounds/medians; limit(1) query series; 24-row grids
    "operators/tokenizer.py": {"top": 1},              # limit(1)
    "operators/tpch.py": {"n": 2, "thresh": 1},        # nation; 1-row scalar
    "operators/tpch2.py": {"n": 1, "n1": 2, "n2": 2, "r": 1, "top": 1},
    "operators/tpch3.py": {"n": 3, "nat": 1, "r": 1, "total": 1},
    "plans/ranking.py": {"bnds": 1, "offs": 1},        # quantile bounds; per-bucket offsets
    "sources/formats.py": {"first": 1, "mind": 1},     # 1-row min partitions
    "streaming/batch_windows.py": {"g": 1},            # 1-row global max
    "streaming/jobs.py": {"dim": 1},                   # literal event-type dim
}

_RX = re.compile(r"F\.broadcast\(\s*([A-Za-z_]\w*)")
_RX_ANY = re.compile(r"F\.broadcast\(")


def _sources():
    for dirpath, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            with open(path, encoding="utf-8") as fh:
                yield rel, fh.read()


def _inventory():
    inv = {}
    for rel, src in _sources():
        toks = _RX.findall(src)
        # Fail CLOSED: every F.broadcast( site must tokenize to an
        # identifier the allowlist can key — a site the tokenizer can't
        # see (comment between paren and argument, parenthesized or
        # literal argument) must not silently bypass review.
        n_sites = len(_RX_ANY.findall(src))
        assert n_sites == len(toks), (
            f"{rel}: {n_sites} F.broadcast( sites but only {len(toks)} "
            "tokenized to a leading identifier — rewrite the opaque "
            "site(s) as F.broadcast(<name>) so the allowlist can key it"
        )
        if toks:
            inv[rel] = dict(Counter(toks))
    return inv


def _code_only(src: str) -> str:
    """Blank out string literals and comments, preserving line
    structure, so code-shape scans don't match docstring prose."""
    import io
    import tokenize

    out = []
    prev_end = (1, 0)
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type in (tokenize.STRING, tokenize.COMMENT):
            text = "\n" * tok.string.count("\n")
        else:
            text = tok.string
        # re-pad the gap between tokens to keep line numbers stable
        (srow, scol), (erow, ecol) = tok.start, tok.end
        prow, pcol = prev_end
        out.append("\n" * (srow - prow))
        out.append(" " * (scol if srow > prow else scol - pcol))
        out.append(text)
        prev_end = tok.end
    return "".join(out)


def test_no_alternate_broadcast_spellings():
    """The allowlist only sees the F.broadcast( spelling; Spark offers
    three more ways to force a broadcast, and all must stay absent from
    the package so they can't bypass the review gate: the DataFrame
    hint method, a bare `broadcast` import, and SQL hint comments
    (which live inside oracle/query strings, so that scan runs on the
    raw source while the bare-call scan runs on a string/comment-
    stripped rendition).  If one is ever legitimately needed, add its
    site-specific scan here alongside the allowlist entry."""
    offenders = []
    for rel, src in _sources():
        code = _code_only(src)
        for text, pat, label in (
            (code, r"(?<!F\.)(?<!\w)broadcast\(", "bare broadcast( call"),
            (src, r"/\*\+\s*(BROADCAST|MAPJOIN|BROADCASTJOIN)", "SQL broadcast hint"),
        ):
            for m in re.finditer(pat, text, re.IGNORECASE):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{rel}:{line}: {label}")
        # .hint("broadcast"): the method name is code but the argument
        # is a string literal, so match the raw source only where the
        # code rendition confirms a .hint( call on the same line.
        hint_lines = {
            code[: m.start()].count("\n") + 1
            for m in re.finditer(r"\.hint\(", code)
        }
        for m in re.finditer(r"\.hint\(\s*['\"]broadcast", src, re.IGNORECASE):
            line = src[: m.start()].count("\n") + 1
            if line in hint_lines:
                offenders.append(f"{rel}:{line}: .hint('broadcast')")
    assert not offenders, (
        "Broadcast spellings outside the F.broadcast allowlist gate:\n  "
        + "\n  ".join(offenders)
    )


def test_broadcast_hints_are_reviewed():
    inv = _inventory()
    problems = []
    for rel, toks in sorted(inv.items()):
        allowed = ALLOWED.get(rel, {})
        for tok, cnt in sorted(toks.items()):
            if cnt != allowed.get(tok, 0):
                problems.append(
                    f"{rel}: F.broadcast({tok}...) x{cnt} "
                    f"(allowlisted: {allowed.get(tok, 0)})"
                )
    for rel, toks in sorted(ALLOWED.items()):
        for tok, cnt in sorted(toks.items()):
            if inv.get(rel, {}).get(tok, 0) != cnt:
                problems.append(
                    f"{rel}: allowlist expects F.broadcast({tok}...) x{cnt}, "
                    f"found {inv.get(rel, {}).get(tok, 0)}"
                )
    assert not problems, (
        "Broadcast-hint inventory drifted from the reviewed allowlist.\n"
        "A hint is only safe on a BOUNDED side (see module docstring); "
        "review each site below, then update ALLOWED:\n  "
        + "\n  ".join(problems)
    )
