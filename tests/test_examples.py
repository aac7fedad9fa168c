"""Examples smoke test: the walkthroughs must run end to end and recover
their known parameters (example_n1 is the README model; the heavier
examples are covered by their own tests/bench rows)."""

import runpy


def test_example_n1(capsys):
    import re

    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_n1.py")
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "AIS posterior" in out and "smc posterior" in out
    # parse the printed mu means of both posteriors and check ~2.0
    means = [float(m) for m in re.findall(r"\[([\d.]+) ±", out)]
    assert len(means) == 2, out
    for m in means:
        assert abs(m - 2.0) < 0.05, out


def test_example_socks(capsys):
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_socks.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "n_socks" in out and "prop_pairs" in out


def test_example_model_choice(capsys):
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_model_choice.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "log Bayes factor" in out and "log Z_A" in out


def test_example_covariance(capsys):
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_covariance.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "posterior: r =" in out


def test_example_workflow(capsys):
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_workflow.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "rhat" in out and "posterior predictive" in out


def test_example_streaming_sim(capsys):
    """Weibull inference with the streaming-moment hw-PRNG cost (off-TPU
    this exercises the vmapped-threefry fallback path end to end)."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_streaming_sim.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "shape k" in out and "scale lam" in out


def test_example_scan_sim(capsys):
    """Sequential-simulator (Markovian) toolkit: OU 3-parameter recovery
    via streamed lag-1 statistics + drifted-Wiener series matching
    (off-TPU this exercises the vmapped-threefry scan fallback)."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_scan_sim.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "OU reversion a" in out and "Wiener drift mu" in out


def test_example_sir(capsys):
    """Stochastic SIR epidemic ABC (sequential kernel, 2-sub-step
    multi-noise pattern + pytree state + observed series)."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_sir.py")
    runpy.run_path(path, run_name="__main__")  # asserts internally
    out = capsys.readouterr().out
    assert "beta" in out and "R0" in out


def test_example_n2(capsys):
    """5-parameter mixture walkthrough (reference docs example 2):
    both posteriors must localize the peak (a ~ 1)."""
    import os
    import re
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_n2.py")
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "AIS posterior" in out and "smc posterior" in out
    firsts = [float(m) for m in re.findall(r"\[([\d.]+) ±", out)]
    assert len(firsts) == 2, out
    for a in firsts:
        assert abs(a - 1.0) < 0.25, out


def test_example_tsmc(capsys):
    """Conjugate-normal tsmc walkthrough: posterior and log-evidence
    printed against their analytic values (asserted internally by
    comparing the printed numbers here)."""
    import os
    import re
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_tsmc.py")
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    m = re.search(r"log-evidence: (-?[\d.]+)\s+\(analytic (-?[\d.]+)\)",
                  out)
    assert m, out
    got, ana = float(m.group(1)), float(m.group(2))
    assert abs(got - ana) < 0.5, out


def test_example_expmix_reduced():
    """The reference's commented-out heavy benchmark
    (test/runtests.jl:256-274: exp-mixture, expected u1 ~ 0.49,
    p1 ~ 0.88) at reduced cost (n=1e5 draws, AIS(64) x 64 samples):
    the posterior must localize near the reference CI within its own
    MC spread. The full-budget config is examples/example_expmix.py."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    import kissabc_tpu as ka
    from example_expmix import cost, prior

    plan = ka.ApproxPosterior(prior, lambda th, k: cost(th, k, 10**5),
                              0.02)
    u1p, p1p = ka.sample(plan, ka.AIS(64), 64, discard_initial=1500,
                         key=1)
    assert u1p.approx(0.49, atol=0.12), u1p
    assert p1p.approx(0.88, atol=0.12), p1p


def test_example_fused_ais(capsys):
    """The generic-fused-AIS walkthrough recovers the README model off-
    TPU through its portable split path (the fused kernel is TPU-only
    and covered by test_pallas.py::TestFusedAISGeneric)."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "example_fused_ais.py")
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "OK" in out
