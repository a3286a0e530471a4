"""humanml data layer: WordVectorizer parity vs the reference, collate
parity vs `main/data_loaders/tensors.py`, and Text2MotionDataset
behavior on synthetic fixtures."""
import importlib.util
import pickle
import sys

import numpy as np
import pytest
import torch

from diffusestylegesture_tpu.data import humanml as hd

REF = "/root/reference/main"


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def glove_dir(tmp_path_factory):
    """Tiny fake GloVe artifact triple in the reference's format."""
    root = tmp_path_factory.mktemp("glove")
    words = ["unk", "sos", "eos", "walk", "person", "slowly", "the", "a"]
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((len(words), 12)).astype(np.float32)
    np.save(root / "our_vab_data.npy", vectors)
    with open(root / "our_vab_words.pkl", "wb") as f:
        pickle.dump(words, f)
    with open(root / "our_vab_idx.pkl", "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f)
    return str(root)


class TestWordVectorizer:
    def test_parity(self, glove_dir):
        ref_wv_mod = _load(
            f"{REF}/data_loaders/humanml/utils/word_vectorizer.py", "ref_wv")
        ref = ref_wv_mod.WordVectorizer(glove_dir, "our_vab")
        ours = hd.WordVectorizer(glove_dir, "our_vab")
        assert len(ours) == len(ref)
        for token in ["walk/VERB", "person/NOUN", "slowly/ADV", "sos/OTHER",
                      "missing/ADJ", "walk/NOUN", "the/DET"]:
            w_ref, p_ref = ref[token]
            w_ours, p_ours = ours[token]
            np.testing.assert_array_equal(w_ours, w_ref)
            np.testing.assert_array_equal(p_ours, p_ref)
        # VIP override: 'walk' is Act_VIP regardless of tagged POS
        _, pos = ours["walk/NOUN"]
        assert pos[hd.POS_enumerator["Act_VIP"]] == 1


class TestCollateParity:
    def test_collate(self):
        ref_tensors = _load(f"{REF}/data_loaders/tensors.py", "ref_tensors")
        rng = np.random.default_rng(1)
        batch_np, batch_t = [], []
        for i, t in enumerate([10, 7, 4]):
            inp = rng.standard_normal((5, 1, t)).astype(np.float32)
            d = {"inp": inp, "lengths": t, "text": f"cap{i}",
                 "tokens": f"tok{i}", "action": i}
            batch_np.append(d)
            batch_t.append({**d, "inp": torch.from_numpy(inp)})
        motion_ref, cond_ref = ref_tensors.collate(batch_t)
        motion, cond = hd.collate(batch_np)
        np.testing.assert_array_equal(motion, motion_ref.numpy())
        np.testing.assert_array_equal(
            cond["y"]["mask"], cond_ref["y"]["mask"].numpy())
        np.testing.assert_array_equal(
            cond["y"]["lengths"], cond_ref["y"]["lengths"].numpy())
        np.testing.assert_array_equal(
            cond["y"]["action"], cond_ref["y"]["action"].numpy())
        assert cond["y"]["text"] == cond_ref["y"]["text"]

    def test_t2m_collate(self):
        ref_tensors = _load(f"{REF}/data_loaders/tensors.py", "ref_tensors2")
        rng = np.random.default_rng(2)
        rows = []
        for t in (16, 12):
            rows.append((None, None, "cap", 4,
                         rng.standard_normal((t, 9)).astype(np.float32), t,
                         "tok_a"))
        motion_ref, cond_ref = ref_tensors.t2m_collate(rows)
        motion, cond = hd.t2m_collate(rows)
        np.testing.assert_allclose(motion, motion_ref.numpy(), atol=1e-6)
        assert motion.shape == (2, 9, 1, 16)
        np.testing.assert_array_equal(
            cond["y"]["mask"], cond_ref["y"]["mask"].numpy())


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory, glove_dir):
    root = tmp_path_factory.mktemp("t2m")
    motion_dir = root / "joint_vecs"
    text_dir = root / "texts"
    motion_dir.mkdir(), text_dir.mkdir()
    rng = np.random.default_rng(3)
    ids = []
    for i, length in enumerate([60, 80, 45, 120, 30]):  # 30 < min_len: dropped
        name = f"{i:06d}"
        ids.append(name)
        np.save(motion_dir / f"{name}.npy",
                rng.standard_normal((length, 263)).astype(np.float32))
        lines = ["a person walks slowly#walk/VERB slowly/ADV#0.0#0.0"]
        if i == 0:
            # malformed line whose caption contains '#' (present in real
            # HumanML3D releases): fields shift, float(parts[2]) fails —
            # must be SKIPPED, not abort the dataset load (regression)
            lines.append("waves with # gusto#wave/VERB gusto/NOUN#0.0#0.0")
        if i == 1:
            # sub-clip annotation: frames 40..79 (2.0s-4.0s @20fps)
            lines.append("the person walks#person/NOUN walk/VERB#2.0#4.0")
        (text_dir / f"{name}.txt").write_text("\n".join(lines))
    split = root / "test.txt"
    split.write_text("\n".join(ids))
    return str(motion_dir), str(text_dir), str(split)


class TestText2MotionDataset:
    def _make(self, dataset_dir, glove_dir, seed=0):
        motion_dir, text_dir, split = dataset_dir
        cfg = hd.T2MConfig(motion_dir=motion_dir, text_dir=text_dir)
        wv = hd.WordVectorizer(glove_dir, "our_vab")
        mean = np.zeros(263)
        std = np.ones(263)
        return hd.Text2MotionDataset(cfg, mean, std, split, wv, seed=seed)

    def test_filters_and_subclips(self, dataset_dir, glove_dir):
        ds = self._make(dataset_dir, glove_dir)
        # 4 whole clips >= 40 frames + 1 sub-clip (40 frames)
        assert len(ds.name_list) == 5
        assert len(ds) == len(ds.name_list)  # pointer at lengths >= 20

    def test_item_shapes(self, dataset_dir, glove_dir):
        ds = self._make(dataset_dir, glove_dir)
        w, p, caption, sent_len, motion, m_len, tokens = ds[0]
        assert w.shape == (22, 12) and p.shape == (22, 15)
        assert motion.shape == (196, 263)
        assert m_len % 4 == 0
        assert np.all(motion[m_len:] == 0)
        assert tokens.startswith("sos/OTHER")

    def test_seeded_determinism(self, dataset_dir, glove_dir):
        a = self._make(dataset_dir, glove_dir, seed=7)[1]
        b = self._make(dataset_dir, glove_dir, seed=7)[1]
        np.testing.assert_array_equal(a[4], b[4])
        assert a[5] == b[5]

    def test_batches_feed_evaluator(self, dataset_dir, glove_dir):
        ds = self._make(dataset_dir, glove_dir)
        batch = next(ds.batches(batch_size=2))
        assert batch["motions"].shape == (2, 196, 263)
        assert batch["word_embs"].shape == (2, 22, 12)
        assert batch["cap_lens"].max() <= 22
