"""Examples smoke test: the walkthroughs must run end to end and recover
their known parameters (example_n1 is the README model; the heavier
examples are covered by their own tests/bench rows)."""

import runpy


def test_example_n1(capsys):
    runpy.run_path("examples/example_n1.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "AIS posterior" in out and "smc posterior" in out
    # both posteriors print mu ~= 2.0
    assert out.count("2 ±") + out.count("1.999") + out.count("2.0") >= 1
