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


def test_cli_eval_and_rf(tmp_path):
    """The CLI front end (python -m pllmod_tpu): eval + rf end-to-end."""
    import numpy as np
    np.random.seed(0)
    rng = np.random.default_rng(5)
    sys.path.insert(0, REPO)
    from tests import reference_impl as ref
    from tests.test_algorithm import simulate
    tree = ref.random_binary_tree(rng, 8, 0.05, 0.3)
    seqs = simulate(rng, tree, np.array([1., 3., 1., 1., 3., 1.]),
                    np.full(4, 0.25), 1.0, 300)
    fasta = tmp_path / "a.fasta"
    fasta.write_text("".join(f">t{i}\n{s}\n" for i, s in enumerate(seqs)))
    tree.labels = [f"t{i}" for i in range(8)] + tree.labels[8:]
    nwk = tmp_path / "t.nwk"
    nwk.write_text(tree.to_newick())

    env = {**os.environ, "PYTHONPATH": REPO}  # drop the axon hook: CPU
    r = subprocess.run(
        [sys.executable, "-m", "pllmod_tpu", "--platform", "cpu", "eval",
         "--msa", str(fasta), "--tree", str(nwk), "--model", "HKY+G"],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "logL = -" in r.stdout

    trees = tmp_path / "trees.nwk"
    trees.write_text(tree.to_newick() + "\n" + tree.to_newick())
    r = subprocess.run(
        [sys.executable, "-m", "pllmod_tpu", "--platform", "cpu", "rf",
         str(trees)],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "max RF" in r.stdout


def test_cli_support(tmp_path):
    """CLI support subcommand: FBP + TBE drawn onto a best tree."""
    sys.path.insert(0, REPO)
    from tests.test_tree_parity import REF_TREE, BOOT1_TREE, BOOT2_TREE
    best = tmp_path / "best.nwk"
    best.write_text(REF_TREE)
    boots = tmp_path / "boots.nwk"
    boots.write_text(BOOT1_TREE + "\n" + BOOT2_TREE + "\n")
    env = {**os.environ, "PYTHONPATH": REPO}
    r = subprocess.run(
        [sys.executable, "-m", "pllmod_tpu", "--platform", "cpu",
         "support", "--tree", str(best), str(boots),
         "--metric", "both", "--fraction"],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2 bootstrap trees" in r.stdout
    assert "FBP tree: " in r.stdout and "TBE tree: " in r.stdout
    # the cherry (Tamarin,PMarmoset) is present in boot1 only: FBP 0.5;
    # its TBE over {boot1: exact, boot2: mindist 1, p-1=1} is also 0.5
    assert "(Tamarin:0.018821,PMarmoset:0.018728)0.5:" in r.stdout


def test_constrained_search_demo():
    r = _run("constrained_search_demo.py", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "constraint satisfied: True" in r.stdout
