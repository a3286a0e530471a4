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

    def test_fuzzed_files_match_python(self, tmp_path):
        """Generative fuzz: random skeleton shapes, channel layouts, float
        formats (fixed/scientific/longs), whitespace runs and line endings
        — native must equal the Python parser on all of them."""
        rng = np.random.default_rng(123)
        for trial in range(12):
            n_joints = int(rng.integers(1, 6))
            lines = ["HIERARCHY"]
            names = [f"J{k}" for k in range(n_joints)]
            chan_counts = []
            for k, name in enumerate(names):
                tag = "ROOT" if k == 0 else "JOINT"
                indent = "\t" * k
                lines.append(f"{indent}{tag} {name}")
                lines.append(indent + "{")
                off = rng.uniform(-5, 5, 3)
                lines.append(
                    f"{indent}\tOFFSET {off[0]:.6f} {off[1]:.6f} {off[2]:.6f}"
                )
                nch = 6 if k == 0 else 3
                chans = ("Xposition Yposition Zposition " if nch == 6 else "") + \
                    "Zrotation Yrotation Xrotation"
                lines.append(f"{indent}\tCHANNELS {nch} {chans.strip()}")
                chan_counts.append(nch)
            last = "\t" * n_joints
            lines += [f"{last}End Site", last + "{",
                      f"{last}\tOFFSET 0.0 1.0 0.0", last + "}"]
            for k in range(n_joints - 1, -1, -1):
                lines.append("\t" * k + "}")

            T = int(rng.integers(1, 6))
            C = sum(chan_counts)
            lines += ["MOTION", f"Frames: {T}", "Frame Time: 0.033333"]
            vals = rng.standard_normal((T, C)) * np.power(
                10.0, rng.integers(-4, 5, (T, C)).astype(np.float64)
            )
            for row in vals:
                cells = []
                for v in row:
                    fmt = rng.integers(0, 4)
                    if fmt == 0:
                        cells.append(f"{v:.6f}")
                    elif fmt == 1:
                        cells.append(f"{v:e}")
                    elif fmt == 2:
                        cells.append(f"{v:.15g}")
                    else:
                        cells.append(repr(float(v)))
                sep = " " if rng.random() < 0.7 else "  \t"
                lines.append(sep.join(cells) + (" " if rng.random() < 0.3 else ""))

            text = ("\r\n" if trial % 3 == 0 else "\n").join(lines) + "\n"
            path = str(tmp_path / f"fuzz{trial}.bvh")
            with open(path, "w", newline="") as f:
                f.write(text)

            py = P.parse_bvh_python(path)
            cc = native.parse_bvh_fast(path)
            assert cc.columns == py.columns, f"trial {trial}"
            assert cc.values.shape == py.values.shape == (T, C), f"trial {trial}"
            np.testing.assert_array_equal(cc.values, py.values,
                                          err_msg=f"trial {trial}")

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


def test_malformed_input_no_crash(tmp_path):
    """Garbage input must error cleanly (native guards → Python fallback →
    Python error), never segfault the process."""
    import pytest

    from diffusestylegesture_tpu.motion import pipeline as P

    bad = tmp_path / "not_a_bvh.json"
    bad.write_text('{"a": 1}\n}\nEnd Site\nOFFSET 1 2 3\n')
    with pytest.raises(Exception):
        P.parse_bvh(str(bad))


def test_corrupt_motion_line_not_silently_zeroed(tmp_path):
    """A non-numeric token inside the motion block must not be parsed as
    an extra 0.0 (native) — both parsers should reject the file."""
    import pytest

    from diffusestylegesture_tpu.motion import pipeline as P

    p = tmp_path / "c.bvh"
    p.write_text(
        "HIERARCHY\nROOT A\n{\n\tOFFSET 0 0 0\n"
        "\tCHANNELS 3 Zrotation Xrotation Yrotation\n"
        "\tEnd Site\n\t{\n\t\tOFFSET 0 1 0\n\t}\n}\n"
        "MOTION\nFrames: 2\nFrame Time: 0.05\n"
        "1.0 2.0 3.0\n0.1 0.2 x\n"
    )
    with pytest.raises(Exception):
        P.parse_bvh(str(p))
