"""Edge-case guards in BVH loading and ZEGGS featurization."""
import numpy as np
import pytest

from diffusestylegesture_tpu.motion import bvh
from diffusestylegesture_tpu.motion import zeggs_features as zf


def _write_rotation_only_bvh(path, T=4):
    """Every joint (incl. root) declares CHANNELS 3 — no root position."""
    txt = """HIERARCHY
ROOT A
{
\tOFFSET 0.0 1.0 0.0
\tCHANNELS 3 Zrotation Xrotation Yrotation
\tJOINT B
\t{
\t\tOFFSET 0.0 2.0 0.0
\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\tEnd Site
\t\t{
\t\t\tOFFSET 0.0 1.0 0.0
\t\t}
\t}
}
MOTION
Frames: %d
Frame Time: 0.05
""" % T
    rows = "\n".join(" ".join(f"{v:.4f}" for v in np.arange(6) + t) for t in range(T))
    open(path, "w").write(txt + rows + "\n")


class TestRotationOnlyBvh:
    def test_loads_with_offset_positions(self, tmp_path):
        p = str(tmp_path / "rotonly.bvh")
        _write_rotation_only_bvh(p)
        anim = bvh.load(p)
        assert anim["rotations"].shape == (4, 2, 3)
        # root position falls back to its offset
        np.testing.assert_allclose(
            anim["positions"][:, 0], np.tile([0.0, 1.0, 0.0], (4, 1)))
        np.testing.assert_allclose(anim["rotations"][0, 0], [0.0, 1.0, 2.0])


class TestInlineBraceBvh:
    def test_loads_declaration_with_inline_brace(self, tmp_path):
        """Exporters may put the brace on the declaration line
        ('ROOT Hips {'); the declaration must match BEFORE the generic
        '{' skip, as the reference anim/bvh.py does (regression: the
        joint was skipped and the next OFFSET crashed on active=-1)."""
        txt = """HIERARCHY
ROOT A {
\tOFFSET 0.0 1.0 0.0
\tCHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
\tJOINT B {
\t\tOFFSET 0.0 2.0 0.0
\t\tCHANNELS 3 Zrotation Xrotation Yrotation
\t\tEnd Site {
\t\t\tOFFSET 0.0 1.0 0.0
\t\t}
\t}
}
MOTION
Frames: 2
Frame Time: 0.05
0 1 0 0 0 0 10 20 30
0 1 0 0 0 0 11 21 31
"""
        p = str(tmp_path / "brace.bvh")
        open(p, "w").write(txt)
        anim = bvh.load(p)
        assert anim["names"] == ["A", "B"]
        np.testing.assert_allclose(anim["rotations"][0, 1], [10, 20, 30])

    def test_pipeline_and_native_parsers_agree_on_inline_braces(
            self, tmp_path, monkeypatch):
        """Same fix in the pymo-semantics parser and the C++ fast path:
        both must open the scope on the declaration line, or
        OFFSET/CHANNELS mis-target the parent joint."""
        from diffusestylegesture_tpu import native
        from diffusestylegesture_tpu.motion import pipeline as P

        txt = ("HIERARCHY\nROOT A {\n\tOFFSET 0.0 1.0 0.0\n"
               "\tCHANNELS 6 Xposition Yposition Zposition Zrotation "
               "Xrotation Yrotation\n\tJOINT B {\n\t\tOFFSET 0.0 2.0 0.0\n"
               "\t\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
               "\t\tEnd Site {\n\t\t\tOFFSET 0.0 1.0 0.0\n\t\t}\n\t}\n}\n"
               "MOTION\nFrames: 2\nFrame Time: 0.05\n"
               "0 1 0 0 0 0 10 20 30\n0 1 0 0 0 0 11 21 31\n")
        p = str(tmp_path / "brace2.bvh")
        open(p, "w").write(txt)
        monkeypatch.setenv("DSG_TPU_NO_NATIVE", "1")
        d_py = P.parse_bvh(p)
        assert d_py.names == ["A", "B", "B_Nub"]
        np.testing.assert_allclose(d_py.offsets["B"], [0.0, 2.0, 0.0])
        np.testing.assert_allclose(d_py.offsets["B_Nub"], [0.0, 1.0, 0.0])
        if native.available():
            d_cc = native.parse_bvh_fast(p)
            assert d_cc.names == d_py.names and d_cc.columns == d_py.columns
            np.testing.assert_allclose(d_cc.values, d_py.values)


class TestDownSamplerGuards:
    def _track(self, fps, T=12):
        from diffusestylegesture_tpu.motion.pipeline import ChannelData

        cols = ["A_Xrotation", "A_Yrotation"]
        return ChannelData(
            names=["A"], parents={"A": None}, offsets={"A": np.zeros(3)},
            channels={"A": ["Xrotation", "Yrotation"]}, columns=cols,
            values=np.arange(T * 2, dtype=np.float64).reshape(T, 2),
            framerate=1.0 / fps, root_name="A")

    def test_non_divisor_raises(self):
        from diffusestylegesture_tpu.motion.pipeline import DownSampler

        with pytest.raises(ValueError, match="integer multiple"):
            DownSampler(tgt_fps=30).transform(self._track(100))

    def test_upsampling_raises(self):
        from diffusestylegesture_tpu.motion.pipeline import DownSampler

        with pytest.raises(ValueError, match="integer multiple"):
            DownSampler(tgt_fps=30).transform(self._track(20))

    def test_divisor_ok(self):
        from diffusestylegesture_tpu.motion.pipeline import DownSampler

        out = DownSampler(tgt_fps=30).transform(self._track(60))
        assert len(out.values) == 6  # [0:-1:2] of 12 frames


class TestFeaturizeGuards:
    def _anim(self, T=12, fps=60):
        rng = np.random.default_rng(0)
        J = zf.ZEGGS_NJOINTS
        a = {
            "rotations": rng.uniform(-20, 20, (T, J, 3)).astype(np.float32),
            "positions": np.broadcast_to(
                rng.uniform(-5, 5, (J, 3)).astype(np.float32), (T, J, 3)).copy(),
            "offsets": rng.uniform(-5, 5, (J, 3)).astype(np.float32),
            "parents": zf.ZEGGS_PARENTS,
            "names": list(zf.ZEGGS_BONE_NAMES),
            "order": "zyx",
            "frametime": 1.0 / fps,
        }
        a["positions"][:, 0, 1] = 100
        return a

    def test_non_divisor_fps_raises(self):
        with pytest.raises(ValueError, match="integer-divide"):
            zf.featurize_animation(self._anim(fps=30), fps=20)

    def test_upsampling_raises(self):
        with pytest.raises(ValueError, match="integer-divide"):
            zf.featurize_animation(self._anim(fps=20), fps=60)

    def test_divisor_fps_ok(self):
        out = zf.featurize_animation(self._anim(T=12, fps=60), fps=20)
        assert out["features"].shape[0] == 4  # 12 frames / rate 3
