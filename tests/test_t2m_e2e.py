"""End-to-end text-to-motion product path (VERDICT r3 item 7).

Exercises the full MDM-legacy call stack the reference ships as
`main/train/train_mdm.py` + `main/sample/generate.py` + `main/eval/
eval_humanml.py`, here as one runnable slice on a toy corpus:

  raw HumanML3D-format corpus (motion npy + text files)
    -> cli.train_t2m (CLIP caption encoding, TextMDM, jitted train loop,
       orbax checkpoint + t2m_config.json)
    -> cli.generate (raw text prompts -> CFG-guided sampling ->
       recover_from_ric xyz -> results.npy, the reference's contract)
    -> T2M evaluator metrics (matching score / R-precision / FID /
       diversity) on the generated features vs the corpus.
"""
import json
import os
import pickle

import numpy as np
import pytest

from diffusestylegesture_tpu.data import humanml as hd

N_FRAMES = 64
NJ = 263


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("t2m_e2e")
    motion_dir, text_dir = root / "joint_vecs", root / "texts"
    motion_dir.mkdir(), text_dir.mkdir()
    rng = np.random.default_rng(0)
    captions = [
        ("a person walks slowly", "walk/VERB slowly/ADV"),
        ("a person waves quickly", "wave/VERB quickly/ADV"),
    ]
    ids = []
    for i in range(8):
        name = f"{i:06d}"
        ids.append(name)
        length = int(rng.integers(48, 65))
        cls = i % 2
        t = np.arange(length)[:, None]
        base = np.sin(t * (0.1 + 0.2 * cls) + np.arange(NJ)[None] * 0.05)
        motion = (base + 0.1 * rng.standard_normal((length, NJ))).astype(
            np.float32)
        np.save(motion_dir / f"{name}.npy", motion)
        cap, toks = captions[cls]
        (text_dir / f"{name}.txt").write_text(f"{cap}#{toks}#0.0#0.0\n")
    split = root / "train.txt"
    split.write_text("\n".join(ids))

    frames = np.concatenate(
        [np.load(motion_dir / f"{n}.npy") for n in ids])
    np.save(root / "Mean.npy", frames.mean(0))
    np.save(root / "Std.npy", frames.std(0) + 1e-6)

    glove = root / "glove"
    glove.mkdir()
    words = ["unk", "sos", "eos", "a", "person", "walks", "waves",
             "slowly", "quickly", "walk", "wave"]
    vecs = np.random.default_rng(1).standard_normal(
        (len(words), 300)).astype(np.float32)
    np.save(glove / "our_vab_data.npy", vecs)
    with open(glove / "our_vab_words.pkl", "wb") as f:
        pickle.dump(words, f)
    with open(glove / "our_vab_idx.pkl", "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f)
    return {
        "motion_dir": str(motion_dir), "text_dir": str(text_dir),
        "split": str(split), "mean": str(root / "Mean.npy"),
        "std": str(root / "Std.npy"), "glove": str(glove),
        "root": root, "captions": captions,
    }


@pytest.fixture(scope="module")
def trained(corpus):
    from diffusestylegesture_tpu.cli import train_t2m

    save_dir = str(corpus["root"] / "save")
    train_t2m.main([
        "--motion_dir", corpus["motion_dir"],
        "--text_dir", corpus["text_dir"],
        "--split", corpus["split"],
        "--mean", corpus["mean"], "--std", corpus["std"],
        "--save_dir", save_dir,
        "--latent_dim", "32", "--num_layers", "2", "--ff_size", "64",
        "--batch_size", "4", "--num_steps", "40", "--save_interval", "40",
        "--diffusion_steps", "32", "--num_frames", str(N_FRAMES),
        "--lr", "1e-3", "--clip_width", "32", "--clip_layers", "2",
        "--log_interval", "20",
    ])
    return save_dir


class TestT2MEndToEnd:
    def test_config_written(self, trained):
        with open(os.path.join(trained, "t2m_config.json")) as f:
            cfg = json.load(f)
        assert cfg["njoints"] == NJ and cfg["clip"]["width"] == 32

    def test_generate_and_eval(self, corpus, trained):
        from diffusestylegesture_tpu.cli import generate
        from diffusestylegesture_tpu.eval.t2m_evaluator import (
            T2MEvaluator,
            evaluate_diversity,
            evaluate_fid,
            evaluate_matching_score,
        )
        import jax

        prompts = corpus["root"] / "prompts.txt"
        prompts.write_text("a person walks slowly\na person waves quickly\n")
        out_dir = generate.main([
            "--model_path", trained,
            "--input_text", str(prompts),
            "--motion_length", str(N_FRAMES / 20.0),
            "--num_repetitions", "3",
            "--guidance_param", "2.5",
            "--sampler", "ddim", "--respace", "8",
            "--save_feats",
            "--output_dir", str(corpus["root"] / "gen"),
        ])

        # --- the reference results.npy contract (generate.py:139-175) ---
        res = np.load(os.path.join(out_dir, "results.npy"),
                      allow_pickle=True).item()
        B = 2 * 3
        assert res["motion"].shape == (B, 22, 3, N_FRAMES)
        assert np.isfinite(res["motion"]).all()
        assert res["num_samples"] == 2 and res["num_repetitions"] == 3
        assert res["text"][:2] == ["a person walks slowly",
                                   "a person waves quickly"]
        assert os.path.exists(os.path.join(out_dir, "results.txt"))

        feats = np.load(os.path.join(out_dir, "results_feats.npy"))
        assert feats.shape == (B, N_FRAMES, NJ)

        # --- t2m eval suite on generated vs ground-truth features ---
        mean, std = np.load(corpus["mean"]), np.load(corpus["std"])
        wv = hd.WordVectorizer(corpus["glove"], "our_vab")
        dcfg = hd.T2MConfig(
            motion_dir=corpus["motion_dir"], text_dir=corpus["text_dir"],
            max_motion_length=N_FRAMES)
        ds = hd.Text2MotionDataset(dcfg, mean, std, corpus["split"], wv)
        gt_batches = list(ds.batches(batch_size=4))
        assert gt_batches, "ground-truth loader yielded nothing"

        # generated loader in the evaluator-batch contract: captions are
        # the prompts; the evaluator consumes NORMALIZED features
        tok_rows = [["sos/OTHER"] + t.split(" ") + ["eos/OTHER"]
                    for t in ("walk/VERB slowly/ADV", "wave/VERB quickly/ADV")
                    ] * 3
        maxlen = dcfg.max_text_len + 2
        w_embs = np.zeros((B, maxlen, 300), np.float32)
        pos = np.zeros((B, maxlen, len(hd.POS_enumerator)), np.float32)
        cap_lens = np.asarray([len(r) for r in tok_rows])
        for i, row in enumerate(tok_rows):
            for j, tk in enumerate(row):
                w_embs[i, j], pos[i, j] = wv[tk]
        gen_batch = {
            "word_embs": w_embs, "pos_ohot": pos, "cap_lens": cap_lens,
            "motions": (feats - mean) / std,
            "m_lens": np.full((B,), N_FRAMES),
        }

        ev = T2MEvaluator(T2MEvaluator.init_params(jax.random.PRNGKey(0)))
        match, rprec, acts = evaluate_matching_score(
            ev, {"gen": [gen_batch], "gt": gt_batches})
        fids = evaluate_fid(ev, gt_batches, acts)
        divs = evaluate_diversity(acts, diversity_times=4)

        for scores in (match, fids, divs):
            assert np.isfinite(list(scores.values())).all()
        assert 0.0 <= rprec["gen"][-1] <= 1.0
        assert fids["gt"] < 1e-3  # GT vs itself
