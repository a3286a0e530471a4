"""Native C++ BVH parser: correctness vs the Python parser + speed sanity."""
import time

import numpy as np
import pytest

from diffusestylegesture_tpu import native
from diffusestylegesture_tpu.motion import pipeline as P
from test_pipeline import synth_beat_bvh


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeParser:
    def test_matches_python(self, tmp_path):
        path = str(tmp_path / "a.bvh")
        synth_beat_bvh(path, T=200, seed=7)
        py = P.parse_bvh_python(path)
        cc = native.parse_bvh_fast(path)
        assert cc.columns == py.columns
        assert cc.names == py.names
        assert cc.root_name == py.root_name
        assert cc.parents == py.parents
        np.testing.assert_allclose(cc.values, py.values, atol=1e-4)
        np.testing.assert_allclose(
            np.stack([cc.offsets[n] for n in cc.names]),
            np.stack([py.offsets[n] for n in py.names]),
            atol=1e-5,
        )
        assert abs(cc.framerate - py.framerate) < 1e-9

    def test_faster_than_python(self, tmp_path):
        path = str(tmp_path / "big.bvh")
        synth_beat_bvh(path, T=4000, seed=8)
        t0 = time.perf_counter()
        P.parse_bvh_python(path)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        native.parse_bvh_fast(path)
        t_cc = time.perf_counter() - t0
        assert t_cc < t_py  # typically 10-50x

    def test_crlf_and_blank_lines(self, tmp_path):
        """Windows line endings and trailing blank lines parse identically
        in both parsers (mocap exports from Windows tools use CRLF)."""
        path = str(tmp_path / "unix.bvh")
        synth_beat_bvh(path, T=30, seed=10)
        crlf_path = str(tmp_path / "crlf.bvh")
        with open(path, "rb") as f:
            content = f.read()
        with open(crlf_path, "wb") as f:
            f.write(content.replace(b"\n", b"\r\n") + b"\r\n\r\n")
        a = P.parse_bvh_python(crlf_path)
        b = native.parse_bvh_fast(crlf_path)
        ref = P.parse_bvh_python(path)
        np.testing.assert_array_equal(a.values, ref.values)
        np.testing.assert_array_equal(b.values, ref.values)
        assert a.columns == b.columns == ref.columns

    def test_dispatch_uses_native(self, tmp_path, monkeypatch):
        """`pipeline.parse_bvh` (the featurizers' entry) routes to the C++
        parser when available and falls back under DSG_TPU_NO_NATIVE."""
        path = str(tmp_path / "d.bvh")
        synth_beat_bvh(path, T=50, seed=9)
        calls = []
        orig = native.parse_bvh_fast
        monkeypatch.setattr(
            native, "parse_bvh_fast", lambda p: calls.append(p) or orig(p)
        )
        out = P.parse_bvh(path)
        assert calls == [path]
        monkeypatch.setenv("DSG_TPU_NO_NATIVE", "1")
        out_py = P.parse_bvh(path)
        assert len(calls) == 1  # not called again
        np.testing.assert_allclose(out.values, out_py.values, atol=1e-4)
