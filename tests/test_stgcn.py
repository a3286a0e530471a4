"""a2m STGCN eval parity vs the reference (`main/eval/a2m/...`)."""
import pickle
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from diffusestylegesture_tpu.eval import stgcn as st

REF = "/root/reference/main"


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import eval.a2m.recognition.models.stgcnutils.graph as ref_graph
    import eval.a2m.recognition.models.stgcn as ref_stgcn
    import eval.a2m.stgcn.diversity as ref_div

    return ref_graph, ref_stgcn, ref_div


class TestGraphParity:
    @pytest.mark.parametrize("layout", ["openpose", "ntu-rgb+d"])
    @pytest.mark.parametrize("strategy", ["uniform", "distance", "spatial"])
    def test_builtin_layouts(self, ref, layout, strategy):
        ref_graph, _, _ = ref
        g_ref = ref_graph.Graph(layout=layout, strategy=strategy)
        g_ours = st.Graph(layout=layout, strategy=strategy)
        np.testing.assert_allclose(g_ours.A, g_ref.A, atol=1e-12)

    @pytest.mark.parametrize("layout", ["smpl", "smpl_noglobal"])
    def test_smpl_layouts(self, ref, layout, tmp_path):
        ref_graph, _, _ = ref
        # the reference reads the SMPL kintree from a pickle; synthesize it
        # from the same parent table we embed
        kt = [np.array([4294967295] + st.SMPL_PARENTS[1:], dtype=np.int64),
              np.arange(24, dtype=np.int64)]
        path = tmp_path / "kintree.pkl"
        with open(path, "wb") as f:
            pickle.dump(kt, f)
        g_ref = ref_graph.Graph(layout=layout, strategy="spatial",
                                kintree_path=str(path))
        g_ours = st.Graph(layout=layout, strategy="spatial")
        np.testing.assert_allclose(g_ours.A, g_ref.A, atol=1e-12)


class TestSTGCNParity:
    def test_converted_weights(self, ref):
        _, ref_stgcn, _ = ref
        torch.manual_seed(0)
        model = ref_stgcn.STGCN(
            in_channels=6, num_class=5,
            graph_args={"layout": "openpose", "strategy": "spatial"},
            edge_importance_weighting=True, device="cpu").eval()
        # perturb BN running stats so the parity actually covers them
        with torch.no_grad():
            for m in model.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 1.5)
        variables = st.convert_stgcn_ckpt(model.state_dict())
        graph = st.Graph(layout="openpose", strategy="spatial")
        ours = st.STGCN(6, 5, graph)

        rng = np.random.default_rng(0)
        motion = rng.standard_normal((3, 18, 6, 16)).astype(np.float32)
        with torch.no_grad():
            out = model({"output": torch.from_numpy(motion)})
            ref_feats = out["features"].numpy()
            ref_logits = out["yhat"].numpy()
        feats, logits = ours.apply(variables, jnp.asarray(motion))
        np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=2e-4)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)

    def test_no_edge_importance(self, ref):
        _, ref_stgcn, _ = ref
        torch.manual_seed(1)
        model = ref_stgcn.STGCN(
            in_channels=3, num_class=4,
            graph_args={"layout": "openpose", "strategy": "uniform"},
            edge_importance_weighting=False, device="cpu").eval()
        variables = st.convert_stgcn_ckpt(model.state_dict())
        graph = st.Graph(layout="openpose", strategy="uniform")
        ours = st.STGCN(3, 4, graph, edge_importance_weighting=False)
        rng = np.random.default_rng(1)
        motion = rng.standard_normal((2, 18, 3, 12)).astype(np.float32)
        with torch.no_grad():
            ref_logits = model({"output": torch.from_numpy(motion)})["yhat"].numpy()
        _, logits = ours.apply(variables, jnp.asarray(motion))
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)


class TestMetricsParity:
    def test_diversity_multimodality_exact(self, ref):
        _, _, ref_div = ref
        rng = np.random.default_rng(2)
        acts = rng.standard_normal((50, 16)).astype(np.float32)
        labels = rng.integers(0, 4, 50)
        ref_d, ref_m = ref_div.calculate_diversity_multimodality(
            torch.from_numpy(acts), torch.from_numpy(labels), 4, seed=123)
        ours_d, ours_m = st.calculate_diversity_multimodality(
            acts, labels, 4, seed=123)
        assert ours_d == pytest.approx(ref_d, rel=1e-5)
        assert ours_m == pytest.approx(ref_m, rel=1e-5)

    def test_unconstrained(self):
        rng = np.random.default_rng(3)
        acts = rng.standard_normal((30, 8))
        d, m = st.calculate_diversity_multimodality(
            acts, None, 0, seed=1, unconstrained=True)
        assert d > 0 and np.isnan(m)

    def test_accuracy(self):
        yhat = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
        y = np.array([0, 1, 1])
        acc, conf = st.calculate_accuracy(yhat, y, 2)
        assert acc == pytest.approx(2 / 3)
        assert conf.sum() == 3


class TestEvaluationWrapper:
    def test_end_to_end(self):
        variables = st.A2MEvaluation.init_variables(
            jax.random.PRNGKey(0), in_channels=6, num_classes=3,
            layout="openpose")
        ev = st.A2MEvaluation(variables, 6, 3, layout="openpose", seed=0)
        rng = np.random.default_rng(4)

        def loader(shift):
            for _ in range(2):
                yield {
                    "output": shift + rng.standard_normal((4, 18, 6, 16)),
                    "y": rng.integers(0, 3, 4),
                }

        metrics = ev.evaluate({"gt": loader(0.0), "gen": loader(0.3)})
        assert metrics["gt_fid"] < metrics["gen_fid"]
        for key in ("gt_accuracy", "gen_diversity", "gen_multimodality"):
            assert key in metrics
