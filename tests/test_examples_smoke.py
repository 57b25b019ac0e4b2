"""Smoke tests: the fast example drivers must run end-to-end."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, timeout=240):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)


def test_consensus_demo():
    r = _run("consensus_demo.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "splits kept" in r.stdout


def test_rf_distance_demo():
    r = _run("rf_distance_demo.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "max RF" in r.stdout


def test_genotype_demo():
    r = _run("genotype_demo.py", timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "optimized logL" in r.stdout


def test_ml_search_demo():
    r = _run("ml_search_demo.py", timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "parsimony starting tree" in r.stdout
    assert "search:" in r.stdout and "final tree:" in r.stdout


def test_protein_mixture_demo():
    r = _run("protein_mixture_demo.py", timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "37 models" in r.stdout
    assert "bounded" in r.stdout
