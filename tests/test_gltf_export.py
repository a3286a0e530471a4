"""BVH → glTF (GLB) exporter (`motion/gltf_export.py`) — the framework's
rendering hand-off, standing in for the reference's Windows-only
`bvh2fbx` (`ubisoft-laforge-ZeroEGGS-main/ZEGGS/bvh2fbx/bvh2fbx.py`).

The load-bearing check: an independent numpy FK over the exported glTF
node hierarchy + animation buffers reproduces the package's own
position parameterization (`MocapParameterizer("position")`) — i.e. a
standards-compliant glTF consumer will pose the skeleton exactly where
the BVH says.
"""
import numpy as np
from scipy.spatial.transform import Rotation as R

from test_pipeline import synth_beat_bvh

from diffusestylegesture_tpu.motion import pipeline as P
from diffusestylegesture_tpu.motion.gltf_export import (
    bvh_to_glb,
    read_glb,
)


def _export(tmp_path, T=13, seed=0):
    bvh = str(tmp_path / "clip.bvh")
    synth_beat_bvh(bvh, T=T, seed=seed)
    glb = str(tmp_path / "clip.glb")
    bvh_to_glb(bvh, glb)
    return bvh, glb


def _accessor_array(gltf, blob, i):
    acc = gltf["accessors"][i]
    view = gltf["bufferViews"][acc["bufferView"]]
    n = {"SCALAR": 1, "VEC3": 3, "VEC4": 4}[acc["type"]]
    start = view.get("byteOffset", 0)
    arr = np.frombuffer(blob, dtype="<f4",
                        count=acc["count"] * n, offset=start)
    return arr.reshape(acc["count"], n)


class TestGlbContainer:
    def test_structure_and_hierarchy(self, tmp_path):
        bvh, glb = _export(tmp_path)
        gltf, blob = read_glb(glb)
        track = P.parse_bvh(bvh)
        assert gltf["asset"]["version"] == "2.0"
        names = [n["name"] for n in gltf["nodes"]]
        assert names == list(track.names)
        # parent/child edges mirror the BVH skeleton
        for i, node in enumerate(gltf["nodes"]):
            for c in node.get("children", []):
                assert track.parents[names[c]] == names[i]
        # single scene rooted at the BVH root
        assert gltf["scenes"][gltf["scene"]]["nodes"] == [
            names.index(track.root_name)]
        # one rotation channel per 3-rotation joint, translations where
        # position channels exist (root at minimum)
        anim = gltf["animations"][0]
        paths = {}
        for ch in anim["channels"]:
            paths.setdefault(ch["target"]["node"], []).append(
                ch["target"]["path"])
        rot_joints = [j for j in track.names
                      if len(P.joint_rot_order(track, j)) == 3]
        assert sorted(n for n, p in paths.items() if "rotation" in p) == \
            sorted(names.index(j) for j in rot_joints)
        assert "translation" in paths[names.index(track.root_name)]
        # buffer accounting: every accessor lands inside the blob
        assert gltf["buffers"][0]["byteLength"] == len(blob) or \
            gltf["buffers"][0]["byteLength"] <= len(blob)
        for v in gltf["bufferViews"]:
            assert v["byteOffset"] + v["byteLength"] <= len(blob)

    def test_sampler_input_has_minmax_and_quats_unit(self, tmp_path):
        _, glb = _export(tmp_path)
        gltf, blob = read_glb(glb)
        anim = gltf["animations"][0]
        for s in anim["samplers"]:
            inp = gltf["accessors"][s["input"]]
            assert "min" in inp and "max" in inp  # spec-required
            out = gltf["accessors"][s["output"]]
            if out["type"] == "VEC4":
                q = _accessor_array(gltf, blob, s["output"])
                np.testing.assert_allclose(
                    np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
                # hemisphere continuity: consecutive dot products >= 0
                assert float((q[1:] * q[:-1]).sum(axis=1).min()) >= -1e-6


class TestFkEquivalence:
    def test_gltf_fk_matches_position_parameterization(self, tmp_path):
        bvh, glb = _export(tmp_path, T=17, seed=3)
        gltf, blob = read_glb(glb)
        track = P.parse_bvh(bvh)
        pos = P.MocapParameterizer("position").transform(track)
        pidx = pos.column_index()
        T = len(track.values)

        names = [n["name"] for n in gltf["nodes"]]
        parent = {i: None for i in range(len(names))}
        for i, node in enumerate(gltf["nodes"]):
            for c in node.get("children", []):
                parent[c] = i
        anim = gltf["animations"][0]
        rot_anim, trans_anim = {}, {}
        for ch in anim["channels"]:
            s = anim["samplers"][ch["sampler"]]
            arr = _accessor_array(gltf, blob, s["output"])
            if ch["target"]["path"] == "rotation":
                rot_anim[ch["target"]["node"]] = arr
            else:
                trans_anim[ch["target"]["node"]] = arr

        # independent FK: global = parent_global ∘ (t_local, R_local)
        grot = {}  # node -> Rotation (T,)
        gpos = {}  # node -> (T, 3)
        for i in range(len(names)):  # nodes are emitted parse-order (top-down)
            rloc = (R.from_quat(rot_anim[i]) if i in rot_anim
                    else R.identity(T))
            tloc = (trans_anim[i] if i in trans_anim
                    else np.tile(gltf["nodes"][i].get(
                        "translation", [0, 0, 0]), (T, 1)))
            p = parent[i]
            if p is None:
                grot[i], gpos[i] = rloc, np.asarray(tloc, np.float64)
            else:
                gpos[i] = gpos[p] + grot[p].apply(tloc)
                grot[i] = grot[p] * rloc

        for i, name in enumerate(names):
            want = np.stack([pos.values[:, pidx[f"{name}_{a}position"]]
                             for a in "XYZ"], axis=1)
            np.testing.assert_allclose(gpos[i], want, atol=1e-4,
                                       err_msg=name)

    def test_times_match_framerate(self, tmp_path):
        bvh, glb = _export(tmp_path, T=9)
        gltf, blob = read_glb(glb)
        track = P.parse_bvh(bvh)
        anim = gltf["animations"][0]
        times = _accessor_array(
            gltf, blob, anim["samplers"][0]["input"]).ravel()
        np.testing.assert_allclose(
            times, np.arange(9) * track.framerate, rtol=1e-6)


class TestExportCli:
    def test_batch_glb_and_player(self, tmp_path):
        from diffusestylegesture_tpu.cli.export_gltf import main

        b1 = str(tmp_path / "a.bvh")
        b2 = str(tmp_path / "b.bvh")
        synth_beat_bvh(b1, T=7, seed=1)
        synth_beat_bvh(b2, T=7, seed=2)
        out = str(tmp_path / "renders")
        written = main([b1, b2, "--outdir", out, "--player"])
        assert sorted(map(__import__("os").path.basename, written)) == [
            "a.glb", "a.html", "b.glb", "b.html"]
        gltf, blob = read_glb(str(tmp_path / "renders" / "a.glb"))
        assert gltf["animations"]
        html = open(tmp_path / "renders" / "a.html").read()
        assert "start(dataBuffer" in html
