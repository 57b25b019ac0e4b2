"""Model registry tests (reference: src/util/models_{dna,aa,gt,mult}.c)."""

import numpy as np
import pytest

from pllmod_tpu.common import UtilError
from pllmod_tpu.utils import (model_info, model_exists, create_custom,
                              string_to_sym, subst_rate_count)
from pllmod_tpu.utils import models_dna, models_aa, models_gt, models_mult
from pllmod_tpu.ops import eigen as eigen_mod


def test_dna_count_and_aliases():
    assert models_dna.count() == 22
    # aliases resolve to primaries (models_dna.c:109-119)
    assert model_info("TrN").name == "TN93"
    assert model_info("TPM1").name == "K81"
    assert model_info("tim2ef").name == "TIM2"
    assert model_exists("GTR") and model_exists("JC")
    assert not model_exists("NOSUCH")


def test_hky_symmetry_packing():
    hky = model_info("HKY")
    assert hky.n_free_rates == 1
    full = hky.expand_rates(np.array([4.0]))
    np.testing.assert_allclose(np.asarray(full), [1, 4, 1, 1, 4, 1])
    back = hky.pack_rates(np.asarray(full))
    np.testing.assert_allclose(back, [4.0])


def test_gtr_free_params():
    gtr = model_info("GTR")
    assert gtr.n_free_rates == 5
    assert gtr.n_free_freqs == 3
    r = np.array([1.5, 2.0, 0.8, 1.2, 3.0, 1.0])
    free = gtr.pack_rates(r)
    np.testing.assert_allclose(np.asarray(gtr.expand_rates(free)), r)


def test_jc_is_fully_constrained():
    jc = model_info("JC")
    assert jc.n_free_rates == 0
    np.testing.assert_allclose(jc.rates, np.ones(6))
    np.testing.assert_allclose(jc.freqs, np.full(4, 0.25))


def test_gt_models():
    assert models_gt.count() == 9
    m = model_info("GT10")
    assert m.states == 10 and subst_rate_count(10) == 45
    assert m.n_free_rates == 6  # DNA4 classes 1..6, class 0 pinned? no:
    # classes are {0..6}, pinned class is that of the last rate (class 4)
    assert model_info("GTGTR4").name == "GT10"      # alias
    assert model_info("GPGTR4").states == 16
    jc = model_info("GT10JC-SM")
    assert jc.rates.sum() == 24  # single-mutation pairs only


def test_multi_models():
    m = model_info("MULTI7_GTR")
    assert m.states == 7 and m.rates is None
    mk = model_info("MULTI5_MK")
    np.testing.assert_allclose(mk.rates, np.ones(10))
    np.testing.assert_allclose(mk.freqs, np.full(5, 0.2))
    assert models_mult.numstates("MULTI12_JC") == 12
    with pytest.raises(UtilError):
        model_info("MULTI99_GTR")  # >64 states


@pytest.mark.parametrize("name", sorted(models_aa.aa_data.MATRICES))
def test_aa_matrices_valid(name):
    m = model_info(name)
    assert m.states == 20
    assert m.rates.shape == (190,)
    assert np.all(m.rates >= 0)
    np.testing.assert_allclose(m.freqs.sum(), 1.0, atol=1e-12)
    # Q must be a valid generator: rows sum to 0, off-diagonal >= 0
    import jax.numpy as jnp
    Q = np.asarray(eigen_mod.build_q(jnp.asarray(m.rates), jnp.asarray(m.freqs)))
    np.testing.assert_allclose(Q.sum(1), 0, atol=1e-10)
    assert np.all(Q - np.diag(np.diag(Q)) >= 0)
    # mean rate normalized to 1
    np.testing.assert_allclose(-(m.freqs * np.diag(Q)).sum(), 1.0, atol=1e-10)


def test_aa_registry_names():
    assert models_aa.count() == 37
    assert models_aa.exists("Q.PFAM")
    assert models_aa.exists_protmix("LG4X")
    # every registry name resolves to a real table (models_aa.c:28-75);
    # PROTGTR is the free-rate model (rates=None)
    for name in models_aa.names():
        m = model_info(name)
        if name == "PROTGTR":
            assert m.rates is None
        else:
            assert m.rates.shape == (190,)
    # both mixtures fully resolve
    for mix in ("LG4M", "LG4X"):
        mm = models_aa.info_protmix(mix)
        assert len(mm.components) == 4
    with pytest.raises(UtilError, match="not found"):
        model_info("NOSUCHAA")


def test_paml_dat_roundtrip():
    # tiny synthetic .dat: rates 1..190, freqs uniform
    rows = []
    k = 1
    for i in range(1, 20):
        rows.append(" ".join(str(k + j) for j in range(i)))
        k += i
    dat = "\n".join(rows) + "\n" + " ".join(["0.05"] * 20)
    rates, freqs = models_aa.aa_data.parse_paml_dat(dat)
    assert rates.shape == (190,)
    np.testing.assert_allclose(freqs, 0.05)
    # lower-triangle (i,j) order maps to symmetric upper vector
    M = np.zeros((20, 20))
    iu = np.triu_indices(20, 1)
    M[iu] = rates
    assert M[0, 1] == 1 and M[0, 2] == 2 and M[1, 2] == 3


def test_custom_model_and_sym_string():
    m = create_custom("MYMODEL", 4, rate_sym="010010", freq_sym="0123")
    assert m.n_free_rates == 1
    assert m.n_free_freqs == 3
    with pytest.raises(UtilError):
        string_to_sym("01a")
