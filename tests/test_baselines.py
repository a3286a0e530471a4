"""Baseline generators: converted-weight parity vs the reference suite."""
import argparse
import importlib.util

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.models import baselines as B


def _ref_module():
    spec = importlib.util.spec_from_file_location(
        "ref_baselines",
        "/root/reference/main/mydiffusion_zeggs/generate/generate.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
class TestBaselineParity:
    def test_generator_linear(self):
        import torch

        mod = _ref_module()
        torch.manual_seed(0)
        ref = mod.Generator_linear()
        ref.eval()
        rng = np.random.default_rng(0)
        wav = rng.standard_normal((2, 64000)).astype(np.float32) * 0.1
        with torch.no_grad():
            theirs, _ = ref(torch.as_tensor(wav))

        params = {"params": B.convert_generator_linear(
            {k: v for k, v in ref.state_dict().items()}
        )}
        ours, _ = B.GeneratorLinear().apply(params, jnp.asarray(wav))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-4
        )
        # argmax codes agree
        codes = B.GeneratorLinear().sample(params, jnp.asarray(wav))
        with torch.no_grad():
            ref_codes = ref.sample(torch.as_tensor(wav))[0].numpy()
        np.testing.assert_array_equal(
            np.asarray(codes).reshape(-1), ref_codes.reshape(-1)
        )

    def test_generator_gru(self):
        import torch

        mod = _ref_module()
        torch.manual_seed(1)
        ref = mod.Generator_gru()
        ref.eval()
        rng = np.random.default_rng(1)
        wav = rng.standard_normal((2, 64000)).astype(np.float32) * 0.1
        with torch.no_grad():
            theirs, _ = ref(torch.as_tensor(wav))
        params = {"params": B.convert_generator_gru(ref.state_dict())}
        ours, _ = B.GeneratorGRU().apply(params, jnp.asarray(wav))
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-4)

    def test_seq2seq(self):
        import torch

        mod = _ref_module()
        torch.manual_seed(2)
        args = argparse.Namespace(hidden_size=48, n_layers=1, dropout_prob=0.0,
                                  n_pre_poses=2)
        ref = mod.Seq2SeqNet(args, pose_dim=10, n_frames=6, n_words=30,
                             word_embed_size=12, word_embeddings=None)
        ref.eval()
        rng = np.random.default_rng(2)
        Bz, Tt = 2, 5
        tokens = rng.integers(0, 30, (Bz, Tt)).astype(np.int64)
        poses = rng.standard_normal((Bz, 6, 10)).astype(np.float32)
        with torch.no_grad():
            theirs = ref(
                torch.as_tensor(tokens), [Tt] * Bz, torch.as_tensor(poses), None
            ).numpy()

        model = B.Seq2SeqNet(vocab=30, embed_size=12, hidden_size=48,
                             pose_dim=10, n_frames=6, n_pre_poses=2)
        params = {"params": B.convert_seq2seq(ref.state_dict())}
        ours = np.asarray(
            model.apply(params, jnp.asarray(tokens), jnp.asarray(poses))
        )
        np.testing.assert_allclose(ours, theirs, atol=3e-4)

    def test_tisa_parity(self):
        import importlib.util as ilu

        import torch

        spec = ilu.spec_from_file_location(
            "ref_tisa", "/root/reference/main/model/tisa.py"
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(3)
        ref = mod.Tisa(num_attention_heads=6, num_kernels=4)
        with torch.no_grad():
            theirs = ref(13).numpy()

        from diffusestylegesture_tpu.models.tisa import Tisa

        model = Tisa(num_attention_heads=6, num_kernels=4)
        params = {"params": {
            "kernel_offsets": ref.kernel_offsets.detach().numpy(),
            "kernel_amplitudes": ref.kernel_amplitudes.detach().numpy(),
            "kernel_sharpness": ref.kernel_sharpness.detach().numpy(),
        }}
        ours = np.asarray(model.apply(params, 13))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)
        # scores are translation-invariant: constant along diagonals
        for k in (-3, 0, 4):
            diag = np.diagonal(ours, offset=k, axis1=1, axis2=2)
            np.testing.assert_allclose(
                diag, np.broadcast_to(diag[:, :1], diag.shape), atol=1e-6
            )

    def test_dead_baselines_are_unconstructable(self):
        """Pin the skip rationale: Generator_diff needs modules whose import
        the reference comments out, diffwav needs an external package."""
        mod = _ref_module()
        with pytest.raises(NameError):
            mod.Generator_diff()
        with pytest.raises(ImportError):
            importlib.util.spec_from_file_location(
                "ref_diffwav",
                "/root/reference/main/mydiffusion_zeggs/generate/diffwav.py",
            ).loader.exec_module(
                importlib.util.module_from_spec(
                    importlib.util.spec_from_file_location(
                        "ref_diffwav",
                        "/root/reference/main/mydiffusion_zeggs/generate/diffwav.py",
                    )
                )
            )
