"""Full string-key registry coverage (SURVEY.md Appendix A / mtf.h keys).

Every reference factory key must construct (cheap configs — construction
only; behavior is covered by the per-module tests).
"""
import pytest

from mtf_tpu import create_tracker

SM_KEYS = ("esm aesm iclk ic fclk fc falk fa ialk ia eslm esl aelm iclm "
           "fclm falm ialm fcsd pf pf100 pf250 pf500 pf1k pfic pffc pfes "
           "nn nnkdt kdt nnkmn kmn gnn fgnn nn1k nn2k nnic nnfc nnes feat "
           "grid lms ransac rnsc gric grfc gres rklt rkl lmes hrch line "
           "regnet pfk pfkic pfkfc pfkes nnk nnkic nnkfc nnkes nnrk "
           "pfrk").split()
AM_KEYS = ("ssd sad nssd zncc scv lscv rscv lrscv kld lkld mi spss ssim "
           "ncc ccre riu ngf pca dfm mcssd ncc3 sum").split()
SSM_KEYS = ("lhom l8 cbh c8 sl3 hom 8 aff 6 laff l6 asrt 5 sim 4 iso 3 "
            "ast 4s ist 3s trans 2 spline spl tps").split()
COMPOSITE_KEYS = "casc casm prl prlt prls prsm".split()
CHEAP = dict(resx=8, resy=8, nn_n_samples=4, pf_n_particles=4,
             rg_n_samples=4, rg_train_steps=1)


@pytest.mark.parametrize("key", SM_KEYS)
def test_sm_key_constructs(key):
    assert create_tracker(key, "ssd", "8", **CHEAP) is not None


@pytest.mark.parametrize("key", COMPOSITE_KEYS)
def test_composite_key_constructs(key):
    assert create_tracker(key, "ssd", "8",
                          members=[("fclk", "ssd", "2"),
                                   ("esm", "ssd", "2")], **CHEAP) is not None


@pytest.mark.parametrize("key", AM_KEYS)
def test_am_key_constructs(key):
    assert create_tracker("fclk", key, "8", **CHEAP) is not None


@pytest.mark.parametrize("key", SSM_KEYS)
def test_ssm_key_constructs(key):
    assert create_tracker("fclk", "ssd", key, **CHEAP) is not None


def test_ilm_keys():
    for ilm in ("gb", "pgb", "rbf"):
        assert create_tracker("fclk", "ssd", "8", ilm=ilm,
                              **CHEAP) is not None


def test_pyramidal_keys():
    for key in ("pyr", "pyrt", "pysm", "pyrs"):
        assert create_tracker(key, "ssd", "8", **CHEAP) is not None
