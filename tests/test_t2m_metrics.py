"""Parity tests for the text-to-motion / unconstrained eval metrics against
the reference implementations (`main/data_loaders/humanml/utils/metrics.py`,
`main/eval/unconstrained/metrics/{kid,precision_recall}.py`), loaded
directly from the read-only reference tree."""
import importlib.util
import sys

import numpy as np
import pytest

from diffusestylegesture_tpu.eval import t2m, unconstrained

REF = "/root/reference/main"


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_metrics():
    return _load(f"{REF}/data_loaders/humanml/utils/metrics.py", "ref_t2m_metrics")


@pytest.fixture(scope="module")
def ref_kid():
    return _load(f"{REF}/eval/unconstrained/metrics/kid.py", "ref_kid")


@pytest.fixture(scope="module")
def ref_pr():
    return _load(f"{REF}/eval/unconstrained/metrics/precision_recall.py", "ref_pr")


@pytest.fixture(scope="module")
def embeds():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((40, 16))
    b = a + 0.3 * rng.standard_normal((40, 16))
    return a, b


class TestRetrievalParity:
    def test_distance_matrix(self, ref_metrics, embeds):
        a, b = embeds
        ours = t2m.euclidean_distance_matrix(a, b)
        ref = ref_metrics.euclidean_distance_matrix(a, b)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)

    def test_top_k(self, ref_metrics, embeds):
        a, b = embeds
        order = np.argsort(t2m.euclidean_distance_matrix(a, b), axis=1)
        ours = t2m.top_k_hits(order, 5)
        ref = ref_metrics.calculate_top_k(order, 5)
        np.testing.assert_array_equal(ours, ref)

    def test_r_precision(self, ref_metrics, embeds):
        a, b = embeds
        for sum_all in (False, True):
            ours = t2m.r_precision(a, b, 3, sum_all=sum_all)
            ref = ref_metrics.calculate_R_precision(a, b, 3, sum_all=sum_all)
            np.testing.assert_array_equal(ours, ref)
        # paired rows are each other's nearest neighbours at this noise level
        assert t2m.r_precision(a, b, 3, sum_all=True)[-1] >= 35

    def test_matching_score(self, ref_metrics, embeds):
        a, b = embeds
        np.testing.assert_allclose(
            t2m.matching_score(a, b, sum_all=True),
            ref_metrics.calculate_matching_score(a, b, sum_all=True),
            rtol=1e-12,
        )


class TestKidParity:
    def test_polynomial_mmd(self, ref_kid, embeds):
        a, b = embeds
        ours_mmd, ours_var = unconstrained.polynomial_mmd(a, b, var_at_m=40)
        ref_mmd, ref_var = ref_kid.polynomial_mmd(a, b, var_at_m=40, ret_var=True)
        np.testing.assert_allclose(ours_mmd, ref_mmd, rtol=1e-9)
        np.testing.assert_allclose(ours_var, ref_var, rtol=1e-9)

    def test_kid_behaviour(self, embeds):
        a, _ = embeds
        rng = np.random.default_rng(3)
        near = a + 0.01 * rng.standard_normal(a.shape)
        far = a + 5.0
        mean_near, _ = unconstrained.kid(a, near, n_subsets=10, subset_size=30)
        mean_far, _ = unconstrained.kid(a, far, n_subsets=10, subset_size=30)
        assert mean_near < mean_far


class TestPrecisionRecallParity:
    def test_manifold_estimate(self, ref_pr, embeds):
        import torch

        a, b = embeds
        ours = unconstrained.manifold_estimate(a, b, k=3)
        ref = ref_pr.manifold_estimate(
            list(torch.from_numpy(a)), list(torch.from_numpy(b)), 3
        )
        assert ours == pytest.approx(ref, abs=1e-12)

    def test_precision_and_recall(self, ref_pr, embeds):
        import torch

        a, b = embeds
        ours_p, ours_r = unconstrained.precision_and_recall(b, a)
        ref_p, ref_r = ref_pr.precision_and_recall(
            torch.from_numpy(b), torch.from_numpy(a)
        )
        assert ours_p == pytest.approx(ref_p, abs=1e-12)
        assert ours_r == pytest.approx(ref_r, abs=1e-12)
