"""SMPL body model (linear blend skinning) + Rotation2xyz, TPU-native.

Ports the reference's MDM-legacy joint-position pipeline
(`main/model/smpl.py`, `main/model/rotation2xyz.py` — both wrap the
`smplx` package + body-model artifacts):

  * `SmplModel` — the SMPL parameter arrays as a plain pytree, loadable
    from an npz export of the official `SMPL_NEUTRAL.pkl` (the pickle
    itself needs chumpy to deserialize; `smpl_pkl_to_npz` converts it
    offline where chumpy/torch exist);
  * `lbs` — shape blendshapes → pose blendshapes → kinematic rigid
    transforms → skinning, exactly smplx's `lbs()` math, fully jittable
    (the per-joint chain walk unrolls at trace time);
  * `SmplJoints` — the reference's `SMPL` wrapper (smpl.py:67-96): 45
    smplx joints (24 LBS + 21 selected vertices) + 9 extra-regressor
    joints, with the vibe/a2m/smpl/a2mpl index maps;
  * `Rotation2xyz` — rotation-representation dispatch (rotvec/rotmat/
    rotquat/rot6d via `utils.rotations`), global-orientation handling,
    root-centering and translation, as `rotation2xyz.py:11-92`.

Vertex-selector indices and the a2m/vibe joint maps are the public
constants from smplx/`main/model/smpl.py:13-62`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rotations as rot

# smplx VertexJointSelector constants (vertex ids on the SMPL mesh):
# face (nose, r/l eye, r/l ear), feet (big/small toe + heel ×2), and
# finger tips (thumb..pinky ×2) — appended after the 24 LBS joints.
_FACE_FEET_VERTS = [332, 6260, 2800, 4071, 583,
                    3216, 3226, 3387, 6617, 6624, 6787]
_TIP_VERTS = [2746, 2319, 2445, 2556, 2673,
              6191, 5782, 5905, 6016, 6133]
EXTRA_JOINT_VERTS = _FACE_FEET_VERTS + _TIP_VERTS

SMPL_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                12, 13, 14, 16, 17, 18, 19, 20, 21]

# main/model/smpl.py:11-62
action2motion_joints = [8, 1, 2, 3, 4, 5, 6, 7, 0, 9, 10, 11, 12, 13, 14,
                        21, 24, 38]
JOINTSTYPE_ROOT = {"a2m": 0, "smpl": 0, "a2mpl": 0, "vibe": 8}
JOINT_MAP = {
    "OP Nose": 24, "OP Neck": 12, "OP RShoulder": 17, "OP RElbow": 19,
    "OP RWrist": 21, "OP LShoulder": 16, "OP LElbow": 18, "OP LWrist": 20,
    "OP MidHip": 0, "OP RHip": 2, "OP RKnee": 5, "OP RAnkle": 8,
    "OP LHip": 1, "OP LKnee": 4, "OP LAnkle": 7, "OP REye": 25,
    "OP LEye": 26, "OP REar": 27, "OP LEar": 28, "OP LBigToe": 29,
    "OP LSmallToe": 30, "OP LHeel": 31, "OP RBigToe": 32,
    "OP RSmallToe": 33, "OP RHeel": 34, "Right Ankle": 8, "Right Knee": 5,
    "Right Hip": 45, "Left Hip": 46, "Left Knee": 4, "Left Ankle": 7,
    "Right Wrist": 21, "Right Elbow": 19, "Right Shoulder": 17,
    "Left Shoulder": 16, "Left Elbow": 18, "Left Wrist": 20,
    "Neck (LSP)": 47, "Top of Head (LSP)": 48, "Pelvis (MPII)": 49,
    "Thorax (MPII)": 50, "Spine (H36M)": 51, "Jaw (H36M)": 52,
    "Head (H36M)": 53, "Nose": 24, "Left Eye": 26, "Right Eye": 25,
    "Left Ear": 28, "Right Ear": 27,
}
JOINT_NAMES = [
    "OP Nose", "OP Neck", "OP RShoulder", "OP RElbow", "OP RWrist",
    "OP LShoulder", "OP LElbow", "OP LWrist", "OP MidHip", "OP RHip",
    "OP RKnee", "OP RAnkle", "OP LHip", "OP LKnee", "OP LAnkle",
    "OP REye", "OP LEye", "OP REar", "OP LEar", "OP LBigToe",
    "OP LSmallToe", "OP LHeel", "OP RBigToe", "OP RSmallToe", "OP RHeel",
    "Right Ankle", "Right Knee", "Right Hip", "Left Hip", "Left Knee",
    "Left Ankle", "Right Wrist", "Right Elbow", "Right Shoulder",
    "Left Shoulder", "Left Elbow", "Left Wrist", "Neck (LSP)",
    "Top of Head (LSP)", "Pelvis (MPII)", "Thorax (MPII)",
    "Spine (H36M)", "Jaw (H36M)", "Head (H36M)", "Nose", "Left Eye",
    "Right Eye", "Left Ear", "Right Ear",
]


@dataclasses.dataclass
class SmplModel:
    """SMPL parameter arrays (neutral model: V=6890, J=24, betas=10)."""

    v_template: jnp.ndarray        # (V, 3)
    shapedirs: jnp.ndarray         # (V, 3, num_betas)
    posedirs: jnp.ndarray          # ((J-1)*9, V*3) — smplx layout
    j_regressor: jnp.ndarray       # (J, V)
    lbs_weights: jnp.ndarray       # (V, J)
    parents: tuple = tuple(SMPL_PARENTS)
    j_regressor_extra: Optional[jnp.ndarray] = None  # (E, V)

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @classmethod
    def from_npz(cls, path: str) -> "SmplModel":
        data = np.load(path, allow_pickle=False)
        return cls(
            v_template=jnp.asarray(data["v_template"], jnp.float32),
            shapedirs=jnp.asarray(data["shapedirs"], jnp.float32),
            posedirs=jnp.asarray(data["posedirs"], jnp.float32),
            j_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
            lbs_weights=jnp.asarray(data["weights"], jnp.float32),
            parents=tuple(int(p) for p in data["kintree_parents"]),
            j_regressor_extra=(
                jnp.asarray(data["J_regressor_extra"], jnp.float32)
                if "J_regressor_extra" in data else None),
        )


def smpl_pkl_to_npz(pkl_path: str, npz_path: str,
                    j_regressor_extra_path: Optional[str] = None) -> None:
    """Offline converter: official SMPL pkl (+ SPIN's extra regressor npy)
    -> the npz `SmplModel.from_npz` loads. Needs chumpy-era pickle
    support; run wherever the reference's smplx setup works."""
    import pickle

    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def arr(x):
        return np.asarray(x, dtype=np.float64)

    posedirs = arr(data["posedirs"])  # (V, 3, 207)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # smplx layout
    out = {
        "v_template": arr(data["v_template"]),
        "shapedirs": arr(data["shapedirs"])[..., :10],
        "posedirs": posedirs,
        "J_regressor": (data["J_regressor"].toarray()
                        if hasattr(data["J_regressor"], "toarray")
                        else arr(data["J_regressor"])),
        "weights": arr(data["weights"]),
        "kintree_parents": np.asarray(data["kintree_table"][0]).astype(np.int64),
    }
    out["kintree_parents"][0] = -1
    if j_regressor_extra_path is not None:
        out["J_regressor_extra"] = np.load(j_regressor_extra_path)
    np.savez(npz_path, **out)


def batch_rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) (smplx
    `batch_rodrigues`)."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros],
                  axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + sin * K + (1 - cos) * (K @ K)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents) -> tuple:
    """(B, J, 3, 3) local rotations + (B, J, 3) rest joints -> posed
    joints and per-joint 4×4 relative transforms (smplx
    `batch_rigid_transform`). The chain walk unrolls at trace time."""
    rel = joints.copy()
    rel = rel.at[:, 1:].add(-joints[:, [max(p, 0) for p in parents][1:]])

    def make(rotmat, t):
        b = rotmat.shape[0]
        top = jnp.concatenate([rotmat, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], rotmat.dtype), (b, 1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    transforms = [make(rot_mats[:, 0], rel[:, 0])]
    for j in range(1, joints.shape[1]):
        transforms.append(transforms[parents[j]] @ make(rot_mats[:, j], rel[:, j]))
    transforms = jnp.stack(transforms, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[..., :3, 3]
    # remove the rest-pose joint location from each transform
    joints_h = jnp.concatenate(
        [joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = (transforms @ joints_h[..., None])[..., 0]
    rel_transforms = transforms - jnp.concatenate(
        [jnp.zeros_like(transforms[..., :3]), correction[..., None]], axis=-1)
    return posed_joints, rel_transforms


def lbs(model: SmplModel, betas: jnp.ndarray, pose_rotmats: jnp.ndarray):
    """betas (B, num_betas) + per-joint rotations (B, J, 3, 3) ->
    (vertices (B, V, 3), joints (B, J, 3)) — smplx `lbs()` with
    pose2rot=False."""
    b = betas.shape[0]
    v_shaped = model.v_template[None] + jnp.einsum(
        "bl,vcl->bvc", betas, model.shapedirs)
    j_rest = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)

    eye = jnp.eye(3, dtype=pose_rotmats.dtype)
    pose_feature = (pose_rotmats[:, 1:] - eye).reshape(b, -1)
    v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(b, -1, 3)

    posed_joints, rel_transforms = batch_rigid_transform(
        pose_rotmats, j_rest, model.parents)

    vert_transforms = jnp.einsum(
        "vj,bjxy->bvxy", model.lbs_weights, rel_transforms)
    v_h = jnp.concatenate(
        [v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = (vert_transforms @ v_h[..., None])[..., :3, 0]
    # smplx `lbs()` returns the KINEMATIC joints (J_transformed from
    # batch_rigid_transform), not a re-regression from the skinned
    # vertices — the latter would fold pose blendshapes/LBS blending into
    # every joint and deviate cm-scale on bent poses
    return verts, posed_joints


def vertices2joints(regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("jv,bvc->bjc", regressor, vertices)


class SmplJoints:
    """The reference's SMPL wrapper (smpl.py:67-96): run LBS, append the
    21 selected-vertex joints and the 9 extra-regressor joints, expose
    the vibe/a2m/smpl/a2mpl maps."""

    def __init__(self, model: SmplModel):
        self.model = model
        vibe = np.array([JOINT_MAP[n] for n in JOINT_NAMES])
        a2m = vibe[action2motion_joints]
        smpl_idx = np.arange(24)
        self.maps = {
            "vibe": vibe,
            "a2m": a2m,
            "smpl": smpl_idx,
            "a2mpl": np.unique(np.r_[smpl_idx, a2m]),
        }

    def __call__(self, body_pose: jnp.ndarray, global_orient: jnp.ndarray,
                 betas: jnp.ndarray) -> dict:
        """body_pose (B, 23, 3, 3), global_orient (B, 3, 3) or (B,1,3,3),
        betas (B, num_betas)."""
        if global_orient.ndim == 3:
            global_orient = global_orient[:, None]
        rotmats = jnp.concatenate([global_orient, body_pose], axis=1)
        verts, joints24 = lbs(self.model, betas, rotmats)
        extra_verts = verts[:, jnp.asarray(EXTRA_JOINT_VERTS)]
        all_joints = jnp.concatenate([joints24, extra_verts], axis=1)  # 45
        if self.model.j_regressor_extra is not None:
            all_joints = jnp.concatenate(
                [all_joints,
                 vertices2joints(self.model.j_regressor_extra, verts)], axis=1)
        out = {"vertices": verts}
        n = all_joints.shape[1]
        for name, indexes in self.maps.items():
            if indexes.max() >= n:
                # jnp gathers clamp out-of-range indices silently; the
                # vibe/a2m maps need the 9-row SPIN extra regressor
                raise ValueError(
                    f"joint map {name!r} needs {indexes.max() + 1} joints but "
                    f"only {n} are available (is j_regressor_extra the 9-row "
                    "SPIN regressor?)")
            out[name] = all_joints[:, jnp.asarray(indexes)]
        return out


JOINTSTYPES = ["a2m", "a2mpl", "smpl", "vibe", "vertices"]


class Rotation2xyz:
    """rotation2xyz.py:11-92: rotation features -> joint positions."""

    def __init__(self, smpl_joints: SmplJoints):
        self.smpl = smpl_joints

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 pose_rep: str, translation: bool, glob: bool,
                 jointstype: str, vertstrans: bool,
                 betas: Optional[jnp.ndarray] = None, beta: float = 0.0,
                 glob_rot=None) -> jnp.ndarray:
        """x (B, J[, +1 trans], F, T) -> (B, J_out, 3, T). Unlike the
        torch version, `mask` only zeroes masked frames in the output
        (all frames compute — static shapes under jit)."""
        if pose_rep == "xyz":
            return x
        if jointstype not in JOINTSTYPES:
            raise NotImplementedError("This jointstype is not implemented.")
        if not glob and glob_rot is None:
            raise TypeError("You must specify global rotation if glob is False")

        if translation:
            x_translations = x[:, -1, :3]       # (B, 3, T)
            x_rotations = x[:, :-1]
        else:
            x_rotations = x
        x_rotations = jnp.transpose(x_rotations, (0, 3, 1, 2))  # (B, T, J, F)
        nsamples, time, njoints, feats = x_rotations.shape
        flat = x_rotations.reshape(-1, njoints, feats)

        if pose_rep == "rotvec":
            rotations = rot.axis_angle_to_matrix(flat)
        elif pose_rep == "rotmat":
            rotations = flat.reshape(-1, njoints, 3, 3)
        elif pose_rep == "rotquat":
            rotations = rot.quaternion_to_matrix(flat)
        elif pose_rep == "rot6d":
            rotations = rot.rotation_6d_to_matrix(flat)
        else:
            raise NotImplementedError("No geometry for this one.")

        if not glob:
            glob_rot_mat = rot.axis_angle_to_matrix(jnp.asarray(glob_rot))
            global_orient = jnp.broadcast_to(
                glob_rot_mat, (rotations.shape[0], 3, 3))
        else:
            global_orient = rotations[:, 0]
            rotations = rotations[:, 1:]

        if betas is None:
            betas = jnp.zeros((rotations.shape[0], self.smpl.model.num_betas))
            betas = betas.at[:, 1].set(beta)
        out = self.smpl(body_pose=rotations, global_orient=global_orient,
                        betas=betas)
        joints = out[jointstype]
        x_xyz = joints.reshape(nsamples, time, -1, 3)
        x_xyz = jnp.transpose(x_xyz, (0, 2, 3, 1))  # (B, J_out, 3, T)
        if mask is not None:
            # where, not multiply: padded frames can hold NaN joints
            # (Gram-Schmidt of zero-padded rot6d divides by zero) and
            # 0·NaN stays NaN — the reference writes exact zeros there
            x_xyz = jnp.where(mask[:, None, None, :], x_xyz, 0.0)

        if jointstype != "vertices":
            root_idx = JOINTSTYPE_ROOT[jointstype]
            x_xyz = x_xyz - x_xyz[:, root_idx: root_idx + 1]

        if translation and vertstrans:
            x_translations = x_translations - x_translations[:, :, :1]
            x_xyz = x_xyz + x_translations[:, None]
        return x_xyz
