"""BEAT/TWH composite feature assembly tests."""
import numpy as np
import pytest

from diffusestylegesture_tpu.data import beat_twh as BT
from test_audio import synth_wav
from test_pipeline import synth_beat_bvh


class TestAudioAssembly:
    def test_1133_dims(self):
        y = synth_wav(3.0)
        out = BT.load_audio_features(y, 16000)
        assert out.shape[1] == 40 + 64 + 4 + 1024 + 1
        assert np.isfinite(out).all()


class TestMetadata:
    def test_load(self, tmp_path):
        csv_text = (
            "fname,main_id,main_finger,iloc_id,iloc_finger\n"
            "clip_001,3,finger_incl,5,finger_excl\n"
            "clip_002,1,finger_excl,2,finger_incl\n"
        )
        p = tmp_path / "meta.csv"
        p.write_text(csv_text)
        n, by_fname, by_idx = BT.load_metadata(str(p), "main-agent")
        assert n == 2
        assert by_fname["clip_001_main-agent"] == (True, 2)
        assert by_idx[1] == (False, 0)
        n2, by_fname2, _ = BT.load_metadata(str(p), "interloctr")
        assert by_fname2["clip_001_interloctr"] == (False, 4)


class TestTextGrid:
    def test_long_format(self, tmp_path):
        tg = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.5
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.5
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.5
            text = ""
        intervals [2]:
            xmin = 0.5
            xmax = 1.2
            text = "hello"
        intervals [3]:
            xmin = 1.2
            xmax = 2.5
            text = "world"
"""
        p = tmp_path / "a.TextGrid"
        p.write_text(tg)
        tsv = BT.textgrid_to_tsv(str(p))
        lines = open(tsv).read().strip().splitlines()
        assert len(lines) == 2
        assert lines[0].split("\t")[2] == "hello"


class TestClipBuild:
    def test_beat_clip(self, tmp_path):
        path = str(tmp_path / "m.bvh")
        synth_beat_bvh(path, T=121, fps=120, seed=9)
        y = synth_wav(1.0)
        tsv = tmp_path / "w.tsv"
        tsv.write_text("0.1\t0.4\thello\n")
        rng = np.random.default_rng(0)
        w2v = {"hello": rng.standard_normal(300)}
        sid = np.eye(2, dtype=np.float32)[0]
        clip = BT.build_beat_twh_clip(
            path, y, 16000, str(tsv), w2v, sid, dataset="BEAT"
        )
        T = len(clip["gesture"])
        assert clip["audio"].shape == (T, 1133)
        assert clip["text"].shape == (T, 301)
        assert clip["gesture"].shape[1] % 9 == 0


class TestBVHRepair:
    def test_fix_frame_count(self, tmp_path):
        from diffusestylegesture_tpu.data.bvh_repair import fix_frame_count
        from diffusestylegesture_tpu.motion import pipeline as P

        path = str(tmp_path / "broken.bvh")
        synth_beat_bvh(path, T=50, seed=10)
        # corrupt the header
        content = open(path).read().replace("Frames: 50", "Frames: 777")
        open(path, "w").write(content)
        fixed, n = fix_frame_count(path)
        assert fixed and n == 50
        data = P.parse_bvh(path)
        assert len(data.values) == 50
        # idempotent
        fixed2, _ = fix_frame_count(path)
        assert not fixed2

    def test_reorient_t_pose(self, tmp_path):
        from diffusestylegesture_tpu.data.bvh_repair import reorient_t_pose
        from diffusestylegesture_tpu.motion import pipeline as P

        path = str(tmp_path / "t.bvh")
        synth_beat_bvh(path, T=10, seed=11)
        before = P.parse_bvh(path)
        out = str(tmp_path / "t_re.bvh")
        reorient_t_pose(path, out)
        after = P.parse_bvh(out)
        # offsets X/Z negated
        for n in before.names:
            np.testing.assert_allclose(after.offsets[n][0], -before.offsets[n][0], atol=1e-4)
            np.testing.assert_allclose(after.offsets[n][2], -before.offsets[n][2], atol=1e-4)
        # root rotation channel 4 shifted by -180
        np.testing.assert_allclose(
            after.values[:, 4], before.values[:, 4] - 180.0, atol=1e-4
        )


SHORT_TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

0
2.5
<exists>
1
"IntervalTier"
"words"
0
2.5
3
0
0.5
""
0.5
1.2
"hello"
1.2
2.5
"world"
"""


def test_trimmed_textgrid_two_tiers(tmp_path):
    """Both tiers start at xmin=0.5 (TextGrid trimmed from a longer
    recording): only the FIRST tier is extracted, per the reference's
    `tg.tiers[0]` — the old xmin-restarts-at-zero heuristic leaked the
    phones tier into the word tsv."""
    from diffusestylegesture_tpu.data import beat_twh as BT

    tg = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0.5
xmax = 2.5
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0.5
        xmax = 2.5
        intervals: size = 2
        intervals [1]:
            xmin = 0.5
            xmax = 1.2
            text = "hello"
        intervals [2]:
            xmin = 1.2
            xmax = 2.5
            text = "world"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0.5
        xmax = 2.5
        intervals: size = 2
        intervals [1]:
            xmin = 0.5
            xmax = 1.2
            text = "HH"
        intervals [2]:
            xmin = 1.2
            xmax = 2.5
            text = "W"
"""
    p = tmp_path / "t.TextGrid"
    p.write_text(tg)
    tsv = BT.textgrid_to_tsv(str(p))
    lines = open(tsv).read().strip().splitlines()
    assert [l.split("\t")[2] for l in lines] == ["hello", "world"]


def test_short_format_textgrid(tmp_path):
    from diffusestylegesture_tpu.data.beat_twh import textgrid_to_tsv

    p = tmp_path / "short.TextGrid"
    p.write_text(SHORT_TEXTGRID)
    tsv = textgrid_to_tsv(str(p))
    rows = [ln.split("\t") for ln in open(tsv).read().strip().splitlines()]
    assert [r[2] for r in rows] == ["hello", "world"]
    assert float(rows[0][0]) == 0.5 and float(rows[1][1]) == 2.5
