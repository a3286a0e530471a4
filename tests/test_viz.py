"""pymo viz_tools parity: stick figures, skeleton dump, mocapplayer buffer.

Reference: `BEAT-TWH-main/process/pymo_TWH/viz_tools.py`.
"""
import sys

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import ref_compat
from conftest import requires_reference, REFERENCE_ROOT
from test_pipeline import synth_beat_bvh


def _setup_pymo_path():
    for _m in ("transforms3d", "transforms3d.euler", "transforms3d.quaternions"):
        if _m not in sys.modules:
            sys.modules[_m] = ref_compat.stub_module(_m)
        if "." in _m:
            _parent, _child = _m.rsplit(".", 1)
            setattr(sys.modules[_parent], _child, sys.modules[_m])
    sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")

from diffusestylegesture_tpu.motion import pipeline as P
from diffusestylegesture_tpu.motion import viz
from diffusestylegesture_tpu.motion.pipeline_extras import ConstantsRemoverAllPosRot


def _pos_track(tmp_path, seed=0):
    path = str(tmp_path / "v.bvh")
    synth_beat_bvh(path, T=17, seed=seed)
    track = P.parse_bvh(path)
    return P.MocapParameterizer("position").transform(track)


def _line_segments(ax):
    return sorted(tuple(np.round(ln.get_xydata().ravel(), 5)) for ln in ax.get_lines())


class TestDraw:
    def test_stickfigure_draws_all_bones(self, tmp_path):
        track = _pos_track(tmp_path)
        ax = viz.draw_stickfigure(track, frame=3, draw_names=True)
        # one line per parent→child bone; every joint except the root is a child
        assert len(ax.get_lines()) == len(track.names) - 1
        assert len(ax.collections) == len(track.names)

    def test_stickfigure3d(self, tmp_path):
        track = _pos_track(tmp_path)
        ax = viz.draw_stickfigure3d(track, frame=0)
        assert len(ax.get_lines()) == len(track.names) - 1

    def test_joint_subset_limits_bones(self, tmp_path):
        track = _pos_track(tmp_path)
        ax = viz.draw_stickfigure(track, frame=1, joints=["Hips", "Spine", "Extra1"])
        # only Hips→Spine is drawable inside the subset (Extra1's parent excluded)
        assert len(ax.get_lines()) == 1

    def test_sketch_move(self, tmp_path):
        track = _pos_track(tmp_path)
        ax = viz.sketch_move(track)
        n_frames = (len(track.values) + 3) // 4
        assert len(ax.get_lines()) == n_frames * (len(track.names) - 1)

    def test_viz_cnn_filter(self, tmp_path):
        track = _pos_track(tmp_path)
        feat = np.linspace(-1, 1, 3 * len(track.names)).reshape(3, -1)
        ax = viz.viz_cnn_filter(feat, track)
        assert len(ax.get_lines()) == 3 * (len(track.names) - 1)

    @requires_reference
    def test_stickfigure_matches_pymo(self, tmp_path):
        _setup_pymo_path()
        from pymo.parsers import BVHParser  # type: ignore
        from pymo.preprocessing import MocapParameterizer  # type: ignore
        from pymo.viz_tools import draw_stickfigure  # type: ignore

        path = str(tmp_path / "r.bvh")
        synth_beat_bvh(path, T=17, seed=2)
        ours = P.MocapParameterizer("position").transform(P.parse_bvh(path))
        theirs = MocapParameterizer("position").fit_transform(
            [BVHParser().parse(path)])[0]
        # modern pandas dropped positional fallback for non-integer indexes;
        # the reference calls `df[col][frame]` with an int frame
        theirs.values.reset_index(drop=True, inplace=True)

        ax_o = viz.draw_stickfigure(ours, frame=5)
        ax_r = draw_stickfigure(theirs, frame=5)
        assert _line_segments(ax_o) == _line_segments(ax_r)


class TestPrintSkel:
    @requires_reference
    def test_matches_pymo(self, tmp_path, capsys):
        _setup_pymo_path()
        from pymo.parsers import BVHParser  # type: ignore
        from pymo.viz_tools import print_skel  # type: ignore

        path = str(tmp_path / "s.bvh")
        synth_beat_bvh(path, T=5, seed=3)
        ours_text = viz.print_skel(P.parse_bvh(path))
        capsys.readouterr()
        print_skel(BVHParser().parse(path))
        ref_text = capsys.readouterr().out
        assert ours_text == ref_text


class TestMocapplayerBuffer:
    def test_buffer_structure(self, tmp_path):
        track = _pos_track(tmp_path)
        js = viz.mocapplayer_buffer(track, frame_time=1 / 20, scale=2, camera_z=350)
        assert js.startswith("var dataBuffer = `")
        assert "start(dataBuffer, metadata, 350, 2, 0.05);" in js
        csv = js.split("`")[1]
        header, *rows = csv.strip().split("\n")
        cols = header.split(",")
        assert all("rotation" not in c for c in cols)
        assert len(rows) == len(track.values)
        idx = track.column_index()
        got = np.array([[float(v) for v in r.split(",")] for r in rows])
        want = track.values[:, [idx[c] for c in cols]]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_meta_serialization(self, tmp_path):
        track = _pos_track(tmp_path)
        js = viz.mocapplayer_buffer(track, meta=np.array([[1, 2], [3, 4]]))
        assert "var metadata = [[1,2],[3,4]];" in js


class TestConstantsRemoverAllPosRot:
    @requires_reference
    def test_matches_pymo(self, tmp_path):
        _setup_pymo_path()
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import ConstantsRemover_  # type: ignore

        path = str(tmp_path / "c.bvh")
        synth_beat_bvh(path, T=9, seed=4)
        ours_in = P.parse_bvh(path)
        theirs_in = BVHParser().parse(path)

        ref = ConstantsRemover_().fit([theirs_in])
        ref_out = ref.transform([theirs_in])[0]
        ref_back = ref.inverse_transform([ref_out])[0]

        cr = ConstantsRemoverAllPosRot().fit([ours_in])
        out = cr.transform([ours_in])[0]
        back = cr.inverse_transform([out])[0]

        assert out.columns == list(ref_out.values.columns)
        np.testing.assert_allclose(out.values, ref_out.values.values, atol=1e-6)
        assert back.columns == list(ref_back.values.columns)
        np.testing.assert_allclose(back.values, ref_back.values.values, atol=1e-6)

    def test_roundtrip_constants(self, tmp_path):
        track = _pos_track(tmp_path, seed=5)
        cr = ConstantsRemoverAllPosRot().fit([track])
        out = cr.transform([track])[0]
        assert out.values.shape[1] == 0  # every column is a position one
        back = cr.inverse_transform([out])[0]
        assert set(back.columns) == set(track.columns)
        idx_b = back.column_index()
        idx_t = track.column_index()
        for c in track.columns:
            np.testing.assert_allclose(
                back.values[:, idx_b[c]], track.values[0, idx_t[c]], atol=1e-6)


class TestMocapPlayerHtml:
    """Standalone browser player (`motion/mocap_player.py`) — the product
    surface of the reference's vendored three.js notebook player
    (`viz_tools.nb_play_mocap`, `viz_tools.py:190-234`), as ONE
    self-contained HTML file."""

    def test_written_file_embeds_data_and_skeleton(self, tmp_path):
        from diffusestylegesture_tpu.motion.mocap_player import (
            write_mocap_player_html,
        )

        track = _pos_track(tmp_path)
        out = str(tmp_path / "clip.html")
        got = write_mocap_player_html(track, out, frame_time=1 / 20,
                                      scale=2, camera_z=350)
        assert got == out
        html = open(out).read()
        # the reference data.js contract is spliced in verbatim
        assert viz.mocapplayer_buffer(track, frame_time=1 / 20, scale=2,
                                      camera_z=350) in html
        # the parent map ships with the page (bone rendering)
        import json as _json

        m = html.split("var skeletonParents = ", 1)[1]
        parents = _json.loads(m[: m.index(";\n")])
        assert parents == {k: v for k, v in track.parents.items()}
        # single self-contained document: no external scripts or styles
        assert "src=" not in html.split("</head>")[0]
        assert html.count("<script>") == 1

    def test_render_accepts_reference_contract_buffer(self, tmp_path):
        """Any text ending in start(...) — i.e. a reference-written data.js
        — splices in unchanged."""
        from diffusestylegesture_tpu.motion.mocap_player import (
            render_player_html,
        )

        data_js = ("var dataBuffer = `a_Xposition,a_Yposition,a_Zposition\n"
                   "1.0,2.0,3.0\n`;var metadata = [];"
                   "start(dataBuffer, metadata, 500, 1, 0.05);")
        html = render_player_html(data_js, {"a": None})
        assert data_js in html
        assert '{"a": null}' in html
