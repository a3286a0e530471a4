"""Parity of the action2motion GRU classifier and the unconstrained-STGCN
variant vs the torch reference."""
import sys

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from diffusestylegesture_tpu.eval import action2motion as a2m
from diffusestylegesture_tpu.eval import stgcn as st

REF = "/root/reference/main"


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import eval.a2m.action2motion.models as ref_models
    import eval.unconstrained.models.stgcn as ref_ustgcn

    return ref_models, ref_ustgcn


class TestMotionDiscriminator:
    def test_parity(self, ref):
        ref_models, _ = ref
        torch.manual_seed(0)
        model = ref_models.MotionDiscriminator(
            24, 32, 2, device="cpu", output_size=7).eval()
        params = a2m.convert_motion_discriminator(model.state_dict())
        rng = np.random.default_rng(0)
        motion = rng.standard_normal((3, 8, 3, 20)).astype(np.float32)
        lengths = np.array([20, 15, 5])
        h0 = rng.standard_normal((2, 3, 32)).astype(np.float32)
        with torch.no_grad():
            ref_out = model(
                torch.from_numpy(motion), torch.from_numpy(lengths),
                hidden_unit=torch.from_numpy(h0)).numpy()
        ours = a2m.MotionDiscriminator(32, 2, 7).apply(
            {"params": params}, jnp.asarray(motion), jnp.asarray(lengths),
            jnp.asarray(h0))
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)

    def test_for_fid_features(self, ref):
        ref_models, _ = ref
        torch.manual_seed(1)
        model = ref_models.MotionDiscriminatorForFID(
            12, 16, 2, device="cpu", output_size=4).eval()
        params = a2m.convert_motion_discriminator(model.state_dict())
        rng = np.random.default_rng(1)
        motion = rng.standard_normal((2, 4, 3, 10)).astype(np.float32)
        lengths = np.array([10, 6])
        h0 = np.zeros((2, 2, 16), np.float32)
        with torch.no_grad():
            ref_out = model(
                torch.from_numpy(motion), torch.from_numpy(lengths),
                hidden_unit=torch.from_numpy(h0)).numpy()
        ours = a2m.MotionDiscriminator(16, 2, 4, for_fid=True).apply(
            {"params": params}, jnp.asarray(motion), jnp.asarray(lengths),
            jnp.asarray(h0))
        assert ours.shape == (2, 30)
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


class TestUnconstrainedSTGCN:
    def test_converted_weights(self, ref):
        _, ref_ustgcn = ref
        torch.manual_seed(2)
        model = ref_ustgcn.STGCN(
            in_channels=3, num_class=12,
            graph_args={"layout": "openpose", "strategy": "spatial"},
            edge_importance_weighting=True, device="cpu").eval()
        variables = st.convert_stgcn_ckpt(
            model.state_dict(), channels=st.UNCONSTRAINED_CHANNELS)
        graph = st.Graph(layout="openpose15", strategy="spatial")
        ours = st.STGCN(3, 12, graph, channels=st.UNCONSTRAINED_CHANNELS)
        rng = np.random.default_rng(2)
        # unconstrained forward reads batch['x'] with the same (N, V, C, T)
        # layout the a2m variant calls 'output' (stgcn.py:77-83)
        motion_nvct = rng.standard_normal((2, 15, 3, 16)).astype(np.float32)
        with torch.no_grad():
            batch = {"x": torch.from_numpy(motion_nvct)}
            out = model(batch)
            ref_logits = out["yhat"].numpy()
            ref_feats = out["features"].numpy()
        feats, logits = ours.apply(variables, jnp.asarray(motion_nvct))
        np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=2e-4)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-4)


class TestUnconstrainedMetrics:
    def test_harness(self):
        rng = np.random.default_rng(3)
        gt = rng.standard_normal((60, 30))
        near = gt + 0.05 * rng.standard_normal((60, 30))
        far = gt + 3.0
        m_near = a2m.unconstrained_metrics(gt, near, diversity_times=20,
                                           kid_subsets=10)
        m_far = a2m.unconstrained_metrics(gt, far, diversity_times=20,
                                          kid_subsets=10)
        assert m_near["fid"] < m_far["fid"]
        assert m_near["kid_mean"] < m_far["kid_mean"]
        assert m_near["precision"] > m_far["precision"]
        assert set(m_near) == {"fid", "kid_mean", "kid_std", "precision",
                               "recall", "diversity_gt", "diversity_gen"}
