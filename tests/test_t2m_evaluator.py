"""Converted-weight parity of the t2m evaluator networks vs the torch
reference (`main/data_loaders/humanml/networks/modules.py`), random
weights — same harness style as the WavLM/MDM converter tests."""
import importlib.util
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from diffusestylegesture_tpu.eval import t2m_evaluator as ev

REF = "/root/reference/main/data_loaders/humanml/networks/modules.py"


@pytest.fixture(scope="module")
def ref_modules():
    spec = importlib.util.spec_from_file_location("ref_t2m_modules", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_t2m_modules"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


class TestMovementConvEncoder:
    def test_parity(self, ref_modules, rng):
        torch_enc = ref_modules.MovementConvEncoder(259, 64, 48).eval()
        params = ev.convert_movement_encoder(torch_enc.state_dict())
        x = rng.standard_normal((3, 16, 259)).astype(np.float32)
        with torch.no_grad():
            ref = torch_enc(torch.from_numpy(x)).numpy()
        ours = ev.MovementConvEncoder(64, 48).apply(
            {"params": params}, jnp.asarray(x))
        assert ref.shape == ours.shape == (3, 4, 48)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


class TestBiGRUCoParity:
    def test_motion_encoder(self, ref_modules, rng):
        torch_enc = ref_modules.MotionEncoderBiGRUCo(24, 32, 20, "cpu").eval()
        params = ev.convert_bigru_co(torch_enc.state_dict(), with_pos=False)
        x = rng.standard_normal((4, 12, 24)).astype(np.float32)
        lens = np.array([12, 9, 5, 2])
        with torch.no_grad():
            ref = torch_enc(torch.from_numpy(x), torch.from_numpy(lens)).numpy()
        ours = ev.MotionEncoderBiGRUCo(24, 32, 20).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)

    def test_text_encoder(self, ref_modules, rng):
        torch_enc = ref_modules.TextEncoderBiGRUCo(30, ev.POS_DIM, 28, 22, "cpu").eval()
        params = ev.convert_bigru_co(torch_enc.state_dict(), with_pos=True)
        words = rng.standard_normal((4, 10, 30)).astype(np.float32)
        pos = np.eye(ev.POS_DIM, dtype=np.float32)[
            rng.integers(0, ev.POS_DIM, (4, 10))]
        lens = np.array([10, 7, 4, 1])
        with torch.no_grad():
            ref = torch_enc(
                torch.from_numpy(words), torch.from_numpy(pos),
                torch.from_numpy(lens)).numpy()
        ours = ev.TextEncoderBiGRUCo(30, ev.POS_DIM, 28, 22).apply(
            {"params": params}, jnp.asarray(words), jnp.asarray(pos),
            jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)

    def test_unsorted_lengths_match_input_order(self, ref_modules, rng):
        # our encoder needs no length sorting; feeding shuffled order must
        # produce the same per-row embeddings
        torch.manual_seed(3)
        torch_enc = ref_modules.MotionEncoderBiGRUCo(8, 16, 12, "cpu").eval()
        params = ev.convert_bigru_co(torch_enc.state_dict(), with_pos=False)
        x = rng.standard_normal((3, 9, 8)).astype(np.float32)
        lens = np.array([4, 9, 6])
        enc = ev.MotionEncoderBiGRUCo(8, 16, 12)
        out = np.asarray(enc.apply({"params": params}, jnp.asarray(x), jnp.asarray(lens)))
        order = np.argsort(lens)[::-1]
        out_sorted = np.asarray(enc.apply(
            {"params": params}, jnp.asarray(x[order]), jnp.asarray(lens[order])))
        np.testing.assert_allclose(out[order], out_sorted, atol=1e-6)


class TestWrapperAndHarness:
    @pytest.fixture(scope="class")
    def wrapper(self, ref_modules):
        torch.manual_seed(1)
        movement = ref_modules.MovementConvEncoder(259, 512, 512).eval()
        text = ref_modules.TextEncoderBiGRUCo(300, ev.POS_DIM, 512, 512, "cpu").eval()
        motion = ref_modules.MotionEncoderBiGRUCo(512, 1024, 512, "cpu").eval()
        ckpt = {
            "movement_encoder": movement.state_dict(),
            "text_encoder": text.state_dict(),
            "motion_encoder": motion.state_dict(),
        }
        params = ev.convert_evaluator_ckpt(ckpt)
        return ev.T2MEvaluator(params), (movement, text, motion)

    def test_co_embeddings_vs_torch_pipeline(self, wrapper, rng):
        wrap, (movement, text, motion) = wrapper
        B, T = 3, 16
        motions = rng.standard_normal((B, T, 263)).astype(np.float32)
        m_lens = np.array([16, 12, 8])
        words = rng.standard_normal((B, 6, 300)).astype(np.float32)
        pos = np.eye(ev.POS_DIM, dtype=np.float32)[rng.integers(0, ev.POS_DIM, (B, 6))]
        cap_lens = np.array([6, 4, 2])
        text_emb, motion_emb = wrap.get_co_embeddings(
            words, pos, cap_lens, motions, m_lens)
        with torch.no_grad():
            mv = movement(torch.from_numpy(motions[..., :-4]))
            ref_motion = motion(mv, torch.from_numpy(m_lens) // 4).numpy()
            ref_text = text(
                torch.from_numpy(words), torch.from_numpy(pos),
                torch.from_numpy(cap_lens)).numpy()
        np.testing.assert_allclose(motion_emb, ref_motion, atol=5e-4)
        np.testing.assert_allclose(text_emb, ref_text, atol=5e-4)

    def test_evaluation_harness(self, wrapper, rng):
        wrap, _ = wrapper

        def make_loader(shift=0.0, seed=5):
            r = np.random.default_rng(seed)

            def gen():
                for _ in range(2):
                    yield {
                        "word_embs": r.standard_normal((4, 6, 300)).astype(np.float32),
                        "pos_ohot": np.eye(ev.POS_DIM, dtype=np.float32)[
                            r.integers(0, ev.POS_DIM, (4, 6))],
                        "cap_lens": np.array([6, 5, 4, 3]),
                        "motions": shift
                        + r.standard_normal((4, 16, 263)).astype(np.float32),
                        "m_lens": np.array([16, 16, 12, 8]),
                    }

            return gen

        res = ev.evaluation(
            wrap,
            gt_loader_fn=make_loader(0.0),
            eval_loader_fns={"model": make_loader(0.5, seed=6)},
            replication_times=2,
            diversity_times=4,
        )
        assert set(res) == {
            "Matching Score", "R_precision", "FID", "Diversity", "MultiModality"}
        fid_mean, fid_ci = res["FID"]["model"]
        assert fid_mean > 0 and fid_ci >= 0
        gt_fid, _ = res["FID"]["ground truth"]
        assert gt_fid < fid_mean  # gt embeds closer to gt statistics
        rp_mean, _ = res["R_precision"]["ground truth"]
        assert rp_mean.shape == (3,)
