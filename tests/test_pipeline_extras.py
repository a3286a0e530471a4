"""Parity of the remaining pymo transforms (Slicer, RootTransformer
pos_rot_deltas/smoothing, RootCentricPositionNormalizer, list scalers,
ReverseTime, Flattener) vs reference pymo_TWH on hand-built tracks."""
import sys
import types

import numpy as np
import pandas as pd
import pytest

from conftest import REFERENCE_ROOT

from diffusestylegesture_tpu.motion import pipeline as P
from diffusestylegesture_tpu.motion import pipeline_extras as PX

REF_PROC = f"{REFERENCE_ROOT}/BEAT-TWH-main/process"


def _faithful_quat2euler(q, axes):
    """A real transforms3d.euler.quat2euler for the stub: static 'sabc'
    == intrinsic reversed; returns angles in the static order."""
    from scipy.spatial.transform import Rotation

    assert axes[0] == "s"
    seq = axes[1:][::-1].upper()
    xyzw = np.concatenate([np.asarray(q)[1:], np.asarray(q)[:1]])
    intrinsic = Rotation.from_quat(xyzw).as_euler(seq)
    return tuple(intrinsic[::-1])


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PROC)
    import ref_compat

    ref_compat._stub_audio_toolchain()
    try:
        import scipy.ndimage.filters  # noqa: F401
    except ImportError:
        import scipy.ndimage as ndi

        mod = ref_compat.stub_module("scipy.ndimage.filters")
        mod.gaussian_filter1d = ndi.gaussian_filter1d
        sys.modules["scipy.ndimage.filters"] = mod
    # other tests may have registered flat stubs without gluing children
    # onto the parent module; make `t3d.euler.quat2euler` resolvable
    t3d = sys.modules["transforms3d"]
    euler = sys.modules.get("transforms3d.euler")
    if euler is None:
        euler = ref_compat.stub_module("transforms3d.euler")
        sys.modules["transforms3d.euler"] = euler
    t3d.euler = euler
    euler.quat2euler = _faithful_quat2euler
    import pymo_TWH.preprocessing as pp
    import pymo_TWH.data as pymo_data

    return pp, pymo_data


def make_pair(ref, T=30, seed=0, with_rotations=True):
    """Matching (ChannelData, pymo MocapData) tracks: root with pos+rot
    (ZXY order) and two child joints with positions."""
    _, pymo_data = ref
    rng = np.random.default_rng(seed)
    joints = ["Hips", "Spine", "Head"]
    columns = []
    channels = {}
    for j in joints:
        cols = [f"{j}_{a}position" for a in "XYZ"]
        chans = [f"{a}position" for a in "XYZ"]
        if with_rotations:
            cols += [f"{j}_{a}rotation" for a in "ZXY"]
            chans += [f"{a}rotation" for a in "ZXY"]
        columns += cols
        channels[j] = chans
    vals = rng.uniform(-30, 30, (T, len(columns)))

    cd = P.ChannelData(
        names=list(joints),
        parents={"Hips": None, "Spine": "Hips", "Head": "Spine"},
        offsets={j: np.zeros(3) for j in joints},
        channels=channels,
        columns=columns,
        values=vals.copy(),
        framerate=1 / 30,
        root_name="Hips",
    )

    md = pymo_data.MocapData()
    md.skeleton = {
        j: {"parent": None if j == "Hips" else joints[i - 1],
            "channels": channels[j], "offsets": [0, 0, 0],
            "order": "ZXY" if with_rotations else "",
            "children": []}
        for i, j in enumerate(joints)
    }
    md.channel_names = [(j, c) for j in joints for c in channels[j]]
    md.root_name = "Hips"
    md.framerate = 1 / 30
    md.values = pd.DataFrame(
        data=vals.copy(), columns=columns,
        index=pd.to_timedelta(np.arange(T) / 30, unit="s"))
    return cd, md


class TestSlicer:
    def test_parity_and_inverse(self, ref):
        pp, _ = ref
        cd, md = make_pair(ref, T=25)
        ours = PX.Slicer(10, overlap=0.5)
        theirs = pp.Slicer(10, overlap=0.5)
        ours.fit([cd])
        theirs.fit([md])
        w_ours = ours.transform([cd])
        w_theirs = theirs.transform([md])
        np.testing.assert_allclose(w_ours, w_theirs, atol=1e-12)
        inv_ours = ours.inverse_transform(list(w_ours))
        inv_theirs = theirs.inverse_transform(list(w_theirs))
        assert len(inv_ours) == len(inv_theirs)
        np.testing.assert_allclose(
            inv_ours[0].values, inv_theirs[0].values.values, atol=1e-12)

    def test_too_short_track(self, ref):
        cd, _ = make_pair(ref, T=4)
        assert PX.Slicer(10).fit([cd]).transform([cd]).size == 0


class TestRootTransformerExtras:
    def test_pos_rot_deltas_parity(self, ref):
        pp, _ = ref
        cd, md = make_pair(ref, T=40, seed=3)
        ours = P.RootTransformer("pos_rot_deltas", position_smoothing=2,
                                 rotation_smoothing=2).fit(cd).transform(cd)
        theirs = pp.RootTransformer(
            "pos_rot_deltas", position_smoothing=2,
            rotation_smoothing=2).transform([md])[0]
        assert list(ours.columns) == list(theirs.values.columns)
        np.testing.assert_allclose(
            ours.values, theirs.values.values, atol=1e-8)

    def test_pos_rot_deltas_no_smoothing(self, ref):
        pp, _ = ref
        cd, md = make_pair(ref, T=20, seed=4)
        ours = P.RootTransformer("pos_rot_deltas").fit(cd).transform(cd)
        theirs = pp.RootTransformer("pos_rot_deltas").transform([md])[0]
        np.testing.assert_allclose(ours.values, theirs.values.values, atol=1e-8)

    def test_abs_deltas_smoothing_roundtrip(self, ref):
        # the reference's smoothing branch crashes under modern pandas
        # (`dx[0] = dx[1]` label-indexes a timedelta index,
        # preprocessing.py:524-526), so assert the documented semantics
        # directly: residual absolutes + smoothed deltas, and the inverse
        # reconstructing the original trajectory.
        from scipy.ndimage import gaussian_filter1d

        cd, _ = make_pair(ref, T=20, seed=5, with_rotations=False)
        rt_ours = P.RootTransformer("abdolute_translation_deltas",
                                    position_smoothing=1.5)
        t_ours = rt_ours.fit(cd).transform(cd)
        idx = t_ours.column_index()
        x = cd.values[:, cd.column_index()["Hips_Xposition"]]
        x_sm = gaussian_filter1d(x, 1.5, axis=0, mode="nearest")
        np.testing.assert_allclose(
            t_ours.values[:, idx["Hips_Xposition"]], x - x_sm, atol=1e-9)
        dx = np.diff(x_sm, prepend=np.nan)
        dx[0] = dx[1]
        np.testing.assert_allclose(
            t_ours.values[:, idx["Hips_dXposition"]], dx, atol=1e-9)
        inv_ours = rt_ours.inverse_transform(t_ours)
        # residual + cumsum(smoothed deltas) ≈ original up to the start
        # offset the deltas cannot carry (pymo starts at start_pos=0)
        rec = inv_ours.values[:, inv_ours.column_index()["Hips_Xposition"]]
        np.testing.assert_allclose(rec - rec[0], (x - x[0]), atol=0.2)


class TestRootCentricPositionNormalizer:
    def test_parity_and_inverse(self, ref):
        pp, _ = ref
        cd, md = make_pair(ref, T=15, seed=6, with_rotations=False)
        ours_t = PX.RootCentricPositionNormalizer().transform(cd)
        theirs_t = pp.RootCentricPositionNormalizer().transform([md])[0]
        for c in cd.columns:
            np.testing.assert_allclose(
                ours_t.values[:, ours_t.column_index()[c]],
                theirs_t.values[c].values, atol=1e-12, err_msg=c)
        ours_i = PX.RootCentricPositionNormalizer().inverse_transform(ours_t)
        theirs_i = pp.RootCentricPositionNormalizer().inverse_transform([theirs_t])[0]
        for c in cd.columns:
            np.testing.assert_allclose(
                ours_i.values[:, ours_i.column_index()[c]],
                theirs_i.values[c].values, atol=1e-12, err_msg=c)


class TestListScalers:
    def test_standard(self, ref):
        pp, _ = ref
        rng = np.random.default_rng(7)
        arrays = [rng.standard_normal((10, 5)) for _ in range(3)]
        ours = PX.ListStandardScaler().fit(arrays)
        theirs = pp.ListStandardScaler()
        theirs.fit(arrays)
        np.testing.assert_allclose(
            ours.transform(arrays)[0], theirs.transform(arrays)[0], atol=1e-12)
        np.testing.assert_allclose(
            ours.inverse_transform(ours.transform(arrays))[1], arrays[1],
            atol=1e-12)

    def test_minmax(self, ref):
        pp, _ = ref
        rng = np.random.default_rng(8)
        arrays = [rng.uniform(-2, 5, (6, 3)) for _ in range(2)]
        ours = PX.ListMinMaxScaler().fit(arrays)
        theirs = pp.ListMinMaxScaler()
        theirs.fit(arrays)
        np.testing.assert_allclose(
            ours.transform(arrays)[0], theirs.transform(arrays)[0], atol=1e-12)
        out = ours.transform(arrays)
        assert out[0].min() >= 0 and out[0].max() <= 1


class TestReverseTimeAndMisc:
    def test_reverse_time(self, ref):
        pp, _ = ref
        cd, md = make_pair(ref, T=9, seed=9)
        ours = PX.ReverseTime().transform([cd])
        theirs = pp.ReverseTime().transform([md])
        assert len(ours) == len(theirs) == 2
        np.testing.assert_allclose(
            ours[1].values, theirs[1].values.values, atol=1e-12)

    def test_flattener_and_template(self, ref):
        pp, _ = ref
        rng = np.random.default_rng(10)
        arrays = [rng.standard_normal((4, 3)), rng.standard_normal((5, 3))]
        np.testing.assert_allclose(
            PX.Flattener().transform(arrays), pp.Flattener().transform(arrays))
        assert PX.TemplateTransform().transform(arrays) is arrays
