"""Freshness guard for docs/benchmarks.md (VERDICT r3 weak #1).

The benchmark tables are rendered from bench_rows.json (the committed
machine-readable row evidence merged by every full bench run) through
docs/benchmarks.md.tmpl. This test re-renders and asserts the committed
doc matches byte-for-byte — the same drift contract test_api_docs.py
enforces for api.md: change the evidence or the template without
running tools/gen_benchmarks_md.py and the suite fails.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import gen_benchmarks_md  # noqa: E402


def _rows():
    with open(os.path.join(REPO, "bench_rows.json")) as f:
        return json.load(f)


def test_benchmarks_md_matches_evidence():
    with open(os.path.join(REPO, "docs", "benchmarks.md")) as f:
        committed = f.read()
    assert gen_benchmarks_md.render(_rows()) == committed, (
        "docs/benchmarks.md drifted from bench_rows.json + template; "
        "re-run: python tools/gen_benchmarks_md.py")


def test_evidence_has_all_samplers():
    """Every user-facing sampler has driver-capturable row evidence
    (VERDICT r3 weak #3): smc (parity + sweeps), AIS, tsmc, pfilter,
    ABCDE, abc_rejection."""
    rows = _rows()
    for name in ("smc-parity", "sweep-fused", "ais-sweep", "ais-wallclock",
                 "tsmc", "pfilter", "abcde", "rejection", "g-and-k",
                 "pallas-tests"):
        assert name in rows, f"missing bench evidence row: {name}"
    # end-to-end rows carry an explicit posterior/correctness verdict
    for name in ("tsmc", "pfilter", "abcde", "g-and-k", "pallas-tests"):
        assert rows[name].get("ok") is True, (name, rows[name])
    assert rows["smc-parity"]["parity"] is True
