"""MSA module tests (reference: src/msa/pll_msa.c behaviors)."""

import numpy as np
import pytest

from pllmod_tpu.common import MsaError
from pllmod_tpu.msa import (MSA, read_fasta, read_phylip, write_fasta,
                            write_phylip, load_msa, empirical_frequencies,
                            empirical_subst_rates, empirical_invariant_sites,
                            check_msa, compute_stats, STATS_ALL)
from pllmod_tpu.ops import charmap as cm


@pytest.fixture
def msa():
    return MSA(["t1", "t2", "t3", "t4"],
               ["ACGTACGTAC", "ACGTACGTCC", "ACG-ACGTAA", "RCGTACGTAC"])


def test_fasta_roundtrip(msa, tmp_path):
    text = write_fasta(msa)
    back = read_fasta(text)
    assert back.labels == msa.labels
    assert back.sequences == msa.sequences
    p = tmp_path / "a.fasta"
    write_fasta(msa, str(p))
    assert load_msa(str(p)).sequences == msa.sequences


def test_phylip_roundtrip(msa, tmp_path):
    text = write_phylip(msa)
    back = read_phylip(text)
    assert back.labels == msa.labels
    assert back.sequences == msa.sequences
    p = tmp_path / "a.phy"
    write_phylip(msa, str(p))
    assert load_msa(str(p)).sequences == msa.sequences


def test_phylip_genotype_example():
    """The reference's only in-repo dataset (examples/genotype/test.phy)
    format: relaxed PHYLIP with genotype characters."""
    text = "3 5\ns1  ACRWG\ns2  ACMWG\ns3  TCRWG\n"
    m = read_phylip(text)
    assert m.n_taxa == 3 and m.n_sites == 5
    assert check_msa(m, cm.GT10) == []


def test_empirical_freqs_uniform():
    m = MSA(["a", "b"], ["ACGT", "ACGT"])
    f = empirical_frequencies(m, cm.DNA)
    np.testing.assert_allclose(f, 0.25)


def test_empirical_freqs_ambiguity_split():
    # R = A|G contributes half to A and half to G (pll_msa.c ambiguity split)
    m = MSA(["a"], ["R"])
    f = empirical_frequencies(m, cm.DNA, smooth=False)
    np.testing.assert_allclose(f, [0.5, 0, 0.5, 0])


def test_empirical_freqs_ignores_gaps():
    m = MSA(["a", "b"], ["A-", "A-"])
    f = empirical_frequencies(m, cm.DNA, smooth=False)
    np.testing.assert_allclose(f, [1, 0, 0, 0])


def test_empirical_subst_rates_bounds(msa):
    r = empirical_subst_rates(msa, cm.DNA)
    assert r.shape == (6,)
    assert r[-1] == 1.0
    assert np.all(r >= 0.01) and np.all(r <= 50.0)


def test_empirical_subst_rates_signal():
    # alignment with only A<->G differences: AG rate must dominate
    m = MSA(["a", "b", "c"], ["AAAA", "GGGA", "AGAG"])
    r = empirical_subst_rates(m, cm.DNA)
    ag = r[1]
    others = np.delete(r, 1)
    assert ag >= others.max()


def test_invariant_sites(msa):
    # sites 0 is A/A/A/R(=A|G) -> invariant via A; site 3 has T/T/-/T
    p = empirical_invariant_sites(msa, cm.DNA)
    assert 0 < p <= 1
    m2 = MSA(["a", "b"], ["AC", "CA"])
    assert empirical_invariant_sites(m2, cm.DNA) == 0.0


def test_check_msa_reports_positions():
    m = MSA(["a", "b"], ["AC!T", "ACGT"])
    errs = check_msa(m, cm.DNA)
    assert errs == [(0, 2, "!")]


def test_stats_masks():
    m = MSA(["a", "b", "a", "d"],
            ["ACGT", "ACGT", "AC-T", "----"])
    st = compute_stats(m, cm.DNA, STATS_ALL)
    assert st["dup_taxa"] == [(0, 2)]
    assert st["dup_seqs"] == [(0, 1)]  # rows 0 and 1 both "ACGT"
    assert st["gap_seqs"] == [3]
    assert st["gap_cols"] == []
    assert 0 < st["gap_prop"] < 1
    # every column's state-mask AND is non-empty (gaps are all-states)
    assert st["inv_cols"] == [0, 1, 2, 3]


def test_stats_invariant_cols_exact():
    m = MSA(["a", "b"], ["AG", "AC"])
    st = compute_stats(m, cm.DNA, STATS_ALL)
    assert st["inv_cols"] == [0]


def test_filter_and_split():
    m = MSA(["a", "b", "c"], ["ACGT", "TGCA", "AAAA"])
    f = m.filter(drop_rows=[1], drop_cols=[0, 3])
    assert f.labels == ["a", "c"]
    assert f.sequences == ["CG", "AA"]
    parts = m.split(np.array([1, 2, 1, 0]), 2)
    assert parts[0].sequences == ["AG", "TC", "AA"]
    assert parts[1].sequences == ["C", "G", "A"]


def test_ragged_raises():
    with pytest.raises(MsaError):
        MSA(["a", "b"], ["ACG", "AC"])
