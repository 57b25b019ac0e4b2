"""Tree-module parity against the reference's checked-in golden outputs.

Expected numbers come from ``/root/reference/test/out/tree/split-tbe.out``
(inputs embedded in ``/root/reference/test/src/tree/split-tbe.c:44-141``):

- split lightside + Hamming distance on hand-built splits,
- naive Transfer Bootstrap Expectation on a 20-taxon primate tree vs two
  bootstrap trees, checked as the clade→support mapping printed in the
  golden's support-annotated Newick ("TBE tree:" lines).
"""

import re

import numpy as np

from pllmod_tpu.tree import splits as sp
from pllmod_tpu.tree import tbe as tbe_mod
from pllmod_tpu.tree.topology import parse_newick

# ---------------------------------------------------------------------------
# Hamming / lightside goldens (split-tbe.c:44-57 -> split-tbe.out:1-9)
# Reference splits are 32-bit words {0x1, 0xFFFFFFFF} and {0x2, 0xFFFFFFF0};
# ours are 64-bit words, so the same bit patterns are single words below.
# ---------------------------------------------------------------------------


def _lightside(split, n_tips):
    p = int(sp.popcount(split))
    return min(p, n_tips - p)


def test_hamming_golden_64tips():
    s1 = np.array([0x1 | (0xFFFFFFFF << 32)], np.uint64)
    s2 = np.array([0x2 | (0xFFFFFFF0 << 32)], np.uint64)
    # golden: LIGHT SIDE:  31  29, HAMMING_DIST: 6
    assert _lightside(s1, 64) == 31
    assert _lightside(s2, 64) == 29
    assert sp.hamming_distance(s1, s2, 64) == 6


def test_hamming_golden_23tips():
    # At 23 tips the reference truncates to one 32-bit word, i.e. only the
    # low word {0x1} vs {0x2} participates.
    s1 = np.array([0x1], np.uint64)
    s2 = np.array([0x2], np.uint64)
    # golden: LIGHT SIDE:   1   1, HAMMING_DIST: 2
    assert _lightside(s1, 23) == 1
    assert _lightside(s2, 23) == 1
    assert sp.hamming_distance(s1, s2, 23) == 2


# ---------------------------------------------------------------------------
# TBE goldens (split-tbe.c:107-141 -> split-tbe.out "TBE tree:" lines)
# ---------------------------------------------------------------------------

REF_TREE = (
    "(Woolly:0.02000173,Spider:0.01195957,(Howler:0.03921588,"
    "(((Squirrel:0.04951841,(Tamarin:0.01882103,PMarmoset:0.01872779)1000:0.01620522)432:0.00209062,"
    "(Titi:0.01974091,Saki:0.02183432)999:0.01197670)385:0.00073575,(((Gorilla:0.00549912,"
    "(Human:0.00667950,Chimp:0.00208720)792:0.00128616)986:0.00708195,"
    "(Gibbon:0.02407730,Orangutan:0.01258485)738:0.00147021)937:0.01302782,"
    "(Colobus:0.00276602,(DLangur:0.00477650,(Patas:0.01102645,"
    "((Tant_cDNA:0.00133132,AGM_cDNA:0.00133913)998:0.00516221,"
    "(Rhes_cDNA:0.00595363,Baboon:0.00312241)969:0.00413146)657:0.00250131)1000:0.01235639"
    ")505:0.00123650)1000:0.03064698)1000:0.13115789)998:0.01474962)1000:0.00860350);"
)

BOOT1_TREE = (
    "((Squirrel:0.04749782,((Saki:0.02577556,Titi:0.02534069):0.01417705,"
    "(Tamarin:0.01830913,PMarmoset:0.01752493):0.01595714):0.00164378):0.00319885,"
    "(Howler:0.03662786,(Spider:0.01128245,Woolly:0.02588956):0.00481877):0.01827684,"
    "(((Gorilla:0.00609643,(Chimp:0.00068926,Human:0.01011787):0.00064788):0.00456013,"
    "(Gibbon:0.02515313,Orangutan:0.00762452):0.00213596):0.01362313,"
    "((DLangur:0.00941860,Colobus:0.00415358):0.00389312,(Patas:0.01861160,"
    "((Baboon:0.00583652,Rhes_cDNA:0.00860553):0.00375633,(Tant_cDNA:0.00133482,"
    "AGM_cDNA:0.00001389):0.00461931):0.00341803):0.01152701):0.03383894):0.15261034);"
)

BOOT2_TREE = (
    "((Baboon:0.100000,(Colobus:0.100000,(Gibbon:0.100000,"
    "(Tamarin:0.100000,Human:0.100000):0.100000):0.100000):0.100000):0.100000,"
    "(DLangur:0.100000,(AGM_cDNA:0.100000,(Saki:0.100000,((Woolly:0.100000,"
    "Rhes_cDNA:0.100000):0.100000,Chimp:0.100000):0.100000):0.100000):0.100000):0.100000,"
    "(Squirrel:0.100000,((PMarmoset:0.100000,((Patas:0.100000,Tant_cDNA:0.100000):0.100000,"
    "(Spider:0.100000,(Titi:0.100000,"
    "(Howler:0.100000,Orangutan:0.100000):0.100000):0.100000):0.100000):0.100000):0.100000,"
    "Gorilla:0.100000):0.100000):0.100000):0.0;"
)

# Support-annotated Newicks printed by the reference (split-tbe.out).
GOLDEN_TBE_TREE_1 = (
    "(Woolly:0.020002,Spider:0.011960,(Howler:0.039216,(((Squirrel:0.049518,"
    "(Tamarin:0.018821,PMarmoset:0.018728)1.000000:0.016205)0.500000:0.002091,"
    "(Titi:0.019741,Saki:0.021834)1.000000:0.011977)1.000000:0.000736,"
    "(((Gorilla:0.005499,(Human:0.006679,Chimp:0.002087)1.000000:0.001286)"
    "1.000000:0.007082,(Gibbon:0.024077,Orangutan:0.012585)1.000000:0.001470)"
    "1.000000:0.013028,(Colobus:0.002766,(DLangur:0.004777,(Patas:0.011026,"
    "((Tant_cDNA:0.001331,AGM_cDNA:0.001339)1.000000:0.005162,"
    "(Rhes_cDNA:0.005954,Baboon:0.003122)1.000000:0.004131)1.000000:0.002501)"
    "1.000000:0.012356)0.800000:0.001236)1.000000:0.030647)1.000000:0.131158)"
    "1.000000:0.014750)1.000000:0.008604);"
)

GOLDEN_TBE_TREE_2 = (
    "(Woolly:0.020002,Spider:0.011960,(Howler:0.039216,(((Squirrel:0.049518,"
    "(Tamarin:0.018821,PMarmoset:0.018728)0.000000:0.016205)0.000000:0.002091,"
    "(Titi:0.019741,Saki:0.021834)0.000000:0.011977)0.000000:0.000736,"
    "(((Gorilla:0.005499,(Human:0.006679,Chimp:0.002087)0.000000:0.001286)"
    "0.000000:0.007082,(Gibbon:0.024077,Orangutan:0.012585)0.000000:0.001470)"
    "0.000000:0.013028,(Colobus:0.002766,(DLangur:0.004777,(Patas:0.011026,"
    "((Tant_cDNA:0.001331,AGM_cDNA:0.001339)0.000000:0.005162,"
    "(Rhes_cDNA:0.005954,Baboon:0.003122)0.000000:0.004131)0.000000:0.002501)"
    "0.250000:0.012356)0.200000:0.001236)0.166667:0.030647)0.142857:0.131158)"
    "0.000000:0.014750)0.000000:0.008604);"
)


def _annotated_clades(newick: str):
    """Parse {frozenset(tip labels): support} from a support-annotated
    Newick (the reference's pllmod_utree_draw_support output format:
    support replaces the inner-node label)."""
    s = newick.strip().rstrip(";")
    pos = 0
    clades = {}

    def parse():
        nonlocal pos
        if s[pos] == "(":
            pos += 1
            tips = set()
            while True:
                tips |= parse()
                if s[pos] == ",":
                    pos += 1
                    continue
                assert s[pos] == ")"
                pos += 1
                break
            support = None
            if pos < len(s) and s[pos] not in ":,()":
                m = re.match(r"[0-9.]+", s[pos:])
                support = float(m.group())
                pos += m.end()
            if pos < len(s) and s[pos] == ":":
                m = re.match(r":[0-9.eE+\-]+", s[pos:])
                pos += m.end()
            if support is not None:
                clades[frozenset(tips)] = support
            return tips
        m = re.match(r"[^:,()]+", s[pos:])
        name = m.group()
        pos += m.end()
        if pos < len(s) and s[pos] == ":":
            m = re.match(r":[0-9.eE+\-]+", s[pos:])
            pos += m.end()
        return {name}

    parse()
    return clades


def _computed_clades(ref_tree, support_by_edge):
    """{canonical frozenset(tip labels): support} for every inner edge,
    canonicalized to the side NOT containing tip 0 (split normalization)."""
    ref_splits, edge_ids = sp.tree_splits(ref_tree)
    out = {}
    for split, eid in zip(ref_splits, edge_ids):
        tips = set()
        for w, word in enumerate(split):
            word = int(word)
            for j in range(64):
                if word >> j & 1:
                    tips.add(ref_tree.labels[64 * w + j])
        out[frozenset(tips)] = support_by_edge[int(eid)]
    return out


def _canon(clades, labels):
    """Flip each golden clade to the side not containing labels[0]."""
    all_tips = set(labels)
    out = {}
    for tips, supp in clades.items():
        if labels[0] in tips:
            tips = frozenset(all_tips - tips)
        out[tips] = supp
    return out


def _check_tbe(boot_newick, golden_annotated):
    ref = parse_newick(REF_TREE)
    boot = parse_newick(boot_newick)
    support = tbe_mod.tbe_support(ref, [boot])
    got = _computed_clades(ref, support)
    want = _canon(_annotated_clades(golden_annotated), ref.labels)
    assert len(want) == ref.n_tips - 3 == 17
    assert set(got) == set(want)
    for tips in want:
        assert abs(got[tips] - want[tips]) < 1e-6, (sorted(tips),
                                                    got[tips], want[tips])


def test_tbe_golden_boot1():
    _check_tbe(BOOT1_TREE, GOLDEN_TBE_TREE_1)


def test_tbe_golden_boot2():
    _check_tbe(BOOT2_TREE, GOLDEN_TBE_TREE_2)
