"""Text featurizer parity tests vs the reference load_tsv."""
import sys
import ref_compat

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from diffusestylegesture_tpu.data.text import load_tsv, load_tsv_unclipped


TSV = """0.10\t0.50\thello
0.55\t1.20\tbig, world
1.30\t1.90\t#laugh
2.00\t2.40\tmissing*word
"""


@pytest.fixture
def tsv_file(tmp_path):
    p = tmp_path / "a.tsv"
    p.write_text(TSV)
    return str(p)


def vectors():
    rng = np.random.default_rng(0)
    return {
        w: rng.standard_normal(300)
        for w in ("hello", "big", "world", "laugh", "missingword")
    }


class TestSelf:
    def test_shapes_and_flags(self, tsv_file):
        w2v = vectors()
        out = load_tsv(tsv_file, w2v, 90, laughter_flag=True)
        assert out.shape == (90, 302)
        # silence flag off inside words, on outside
        assert out[0, -1] == 1
        assert out[5, -1] == 0  # hello: frames 3..15
        # laughter flag set for '#laugh'
        assert out[40, -2] == 1
        beat = load_tsv(tsv_file, w2v, 90, laughter_flag=False)
        assert beat.shape == (90, 301)


@requires_reference
class TestParity:
    def test_beat(self, tsv_file):
        import types

        for m in ("librosa", "librosa.display", "pydub", "parselmouth", "essentia",
                  "essentia.standard", "textgrid", "joblib", "transforms3d"):
            if m not in sys.modules:
                mod = ref_compat.stub_module(m)
                if m == "essentia.standard":
                    mod.__all__ = []
                sys.modules[m] = mod

        w2v = vectors()
        sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")
        # import just the function source without the heavy module imports:
        import importlib.util

        # reference module imports many missing deps; replicate by exec of
        # the two functions only
        src_path = f"{REFERENCE_ROOT}/BEAT-TWH-main/process/process_TWH_bvh.py"
        import string as _string

        ns = {"np": np, "string": _string}
        src = open(src_path).read()
        for fn in ("def load_tsv_unclipped", "def load_tsv(", "def load_metadata"):
            pass
        import re

        def extract(name, text):
            m = re.search(rf"(?ms)^def {name}\(.*?(?=^def |\Z)", text)
            return m.group(0)

        exec(extract("load_tsv_unclipped", src), ns)  # noqa: S102
        exec(extract("load_tsv", src), ns)  # noqa: S102

        theirs = ns["load_tsv"](tsv_file, w2v, 90)
        ours = load_tsv(tsv_file, w2v, 90, laughter_flag=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_beat_301(self, tsv_file):
        import re

        w2v = vectors()
        src = open(f"{REFERENCE_ROOT}/BEAT-TWH-main/process/process_BEAT_bvh.py").read()

        def extract(name, text):
            m = re.search(rf"(?ms)^def {name}\(.*?(?=^def |\Z)", text)
            return m.group(0)

        import string as _string

        ns = {"np": np, "string": _string}
        exec(extract("load_tsv_unclipped", src), ns)  # noqa: S102
        exec(extract("load_tsv", src), ns)  # noqa: S102
        theirs = ns["load_tsv"](tsv_file, w2v, 90)
        ours = load_tsv(tsv_file, w2v, 90, laughter_flag=False)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)
