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
