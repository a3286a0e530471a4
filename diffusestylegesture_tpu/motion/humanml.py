"""HumanML3D/KIT "RIC" motion representation math, TPU-native.

Ports the reference's MDM-legacy humanml motion kit — the parts its
generate/eval paths actually call:

  * quaternion helpers in the humanml **w-first** convention
    (`main/data_loaders/humanml/common/quaternion.py`: `qinv:16`,
    `qrot:54`, `qmul`, `qbetween`, `quaternion_to_cont6d:314` — note the
    cont6d there takes matrix *columns*, unlike pytorch3d's rows);
  * `recover_root_rot_pos` / `recover_from_ric` / `recover_rot`
    (`main/data_loaders/humanml/scripts/motion_process.py:362-430`) —
    the sequential cumsum recurrences are expressed as `jnp.cumsum`
    so the whole recovery jits to a handful of fused XLA ops;
  * `Skeleton` forward/inverse kinematics over explicit kinematic
    chains (`main/data_loaders/humanml/common/skeleton.py`). Chains are
    static Python tuples, so the per-chain walk unrolls at trace time
    into a fixed op graph — no dynamic control flow under jit.

Skeleton constant tables (`t2m_raw_offsets`, `kit_raw_offsets`, chains)
reproduce `main/data_loaders/humanml/utils/paramUtil.py:4-55` — they are
dataset constants, not code.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# --- dataset skeleton constants (paramUtil.py) -------------------------------

t2m_raw_offsets = np.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, -1, 0],
     [0, 1, 0], [0, -1, 0], [0, -1, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1],
     [0, 1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, -1, 0], [0, -1, 0],
     [0, -1, 0], [0, -1, 0], [0, -1, 0], [0, -1, 0]],
    dtype=np.float64,
)
t2m_kinematic_chain = [
    [0, 2, 5, 8, 11], [0, 1, 4, 7, 10], [0, 3, 6, 9, 12, 15],
    [9, 14, 17, 19, 21], [9, 13, 16, 18, 20],
]
kit_raw_offsets = np.array(
    [[0, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0],
     [0, -1, 0], [0, -1, 0], [-1, 0, 0], [0, -1, 0], [0, -1, 0], [1, 0, 0],
     [0, -1, 0], [0, -1, 0], [0, 0, 1], [0, 0, 1], [-1, 0, 0], [0, -1, 0],
     [0, -1, 0], [0, 0, 1], [0, 0, 1]],
    dtype=np.float64,
)
kit_kinematic_chain = [
    [0, 11, 12, 13, 14, 15], [0, 16, 17, 18, 19, 20], [0, 1, 2, 3, 4],
    [3, 5, 6, 7], [3, 8, 9, 10],
]

# --- RIC channel masks for inpainting-style editing ---------------------------
# (`main/data_loaders/humanml_utils.py`: which of the 263 HumanML channels
# belong to the root trajectory / lower body — the `in_between` and
# `upper_body` edit modes of the MDM-legacy `sample/edit.py` mask these)

HML_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist",
]
NUM_HML_JOINTS = len(HML_JOINT_NAMES)
HML_LOWER_BODY_JOINTS = [
    HML_JOINT_NAMES.index(n)
    for n in ("pelvis", "left_hip", "right_hip", "left_knee", "right_knee",
              "left_ankle", "right_ankle", "left_foot", "right_foot")
]
SMPL_UPPER_BODY_JOINTS = [
    i for i in range(NUM_HML_JOINTS) if i not in HML_LOWER_BODY_JOINTS
]


def _hml_channel_mask(joint_binary: np.ndarray, foot_contact: bool) -> np.ndarray:
    """Expand a per-joint flag into the 263-channel RIC layout:
    root(1+2+1) + ric (J-1)*3 + rot (J-1)*6 + vel J*3 + contacts 4."""
    return np.concatenate([
        [True] * (1 + 2 + 1),
        np.repeat(joint_binary[1:], 3),
        np.repeat(joint_binary[1:], 6),
        np.repeat(joint_binary, 3),
        [foot_contact] * 4,
    ])


HML_ROOT_BINARY = np.array([True] + [False] * (NUM_HML_JOINTS - 1))
HML_ROOT_MASK = _hml_channel_mask(HML_ROOT_BINARY, foot_contact=False)
HML_LOWER_BODY_JOINTS_BINARY = np.array(
    [i in HML_LOWER_BODY_JOINTS for i in range(NUM_HML_JOINTS)])
HML_LOWER_BODY_MASK = _hml_channel_mask(
    HML_LOWER_BODY_JOINTS_BINARY, foot_contact=True)
HML_UPPER_BODY_MASK = ~HML_LOWER_BODY_MASK

# --- w-first quaternion helpers ----------------------------------------------


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (w, x, y, z)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by unit quaternion q; broadcasts over leading dims."""
    q, v = jnp.broadcast_arrays(q[..., :4], jnp.concatenate(
        [v, jnp.zeros_like(v[..., :1])], axis=-1))
    v = v[..., :3]
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qbetween(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating u onto v (both need not be normalized)."""
    w = jnp.sqrt((u**2).sum(-1) * (v**2).sum(-1)) + (u * v).sum(-1)
    xyz = jnp.cross(u, v)
    q = jnp.concatenate([w[..., None], xyz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = (q[..., i] for i in range(4))
    two_s = 2.0 / (q * q).sum(-1)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
            two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
            two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_cont6d(q: jnp.ndarray) -> jnp.ndarray:
    """First two matrix *columns* (humanml convention, quaternion.py:314)."""
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(cont6d: jnp.ndarray) -> jnp.ndarray:
    """Gram–Schmidt from two columns (quaternion.py:321-340)."""
    x_raw = cont6d[..., 0:3]
    y_raw = cont6d[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


# --- RIC feature recovery -----------------------------------------------------


def recover_root_rot_pos(data: jnp.ndarray):
    """(..., T, D) RIC features -> root yaw quaternion (..., T, 4) and root
    position (..., T, 3). The reference's per-frame integration
    (motion_process.py:362-381) becomes two cumsums."""
    rot_vel = data[..., 0]
    shifted = jnp.concatenate(
        [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1)
    r_rot_ang = jnp.cumsum(shifted, axis=-1)
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1)

    lin = jnp.concatenate(
        [jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]], axis=-2)
    r_pos = jnp.stack(
        [lin[..., 0], jnp.zeros_like(lin[..., 0]), lin[..., 1]], axis=-1)
    r_pos = qrot(qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jnp.ndarray, joints_num: int) -> jnp.ndarray:
    """RIC features -> global joint positions (..., T, J, 3)
    (motion_process.py:415-430)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4:(joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))
    positions = qrot(qinv(r_rot_quat)[..., None, :], positions)
    positions = positions.at[..., 0].add(r_pos[..., 0:1])
    positions = positions.at[..., 2].add(r_pos[..., 2:3])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_rot(data: jnp.ndarray) -> jnp.ndarray:
    """RIC features -> per-joint cont6d params with root position padded as
    a pseudo-joint (motion_process.py:400-413). Infers HumanML (263-d, 22
    joints) vs KIT (251-d, 21 joints) from the channel count."""
    joints_num = 22 if data.shape[-1] == 263 else 21
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_pos_pad = jnp.concatenate([r_pos, jnp.zeros_like(r_pos)], axis=-1)[..., None, :]
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    cont6d = data[..., start:start + (joints_num - 1) * 6]
    cont6d = jnp.concatenate([r_rot_cont6d, cont6d], axis=-1)
    cont6d = cont6d.reshape((-1, joints_num, 6))
    return jnp.concatenate(
        [cont6d, r_pos_pad.reshape((-1, 1, 6))], axis=-2)


def recover_from_rot(data: jnp.ndarray, joints_num: int, skeleton: "Skeleton") -> jnp.ndarray:
    """RIC rotation block -> joints via FK (motion_process.py:384-398)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    cont6d = data[..., start:start + (joints_num - 1) * 6]
    cont6d = jnp.concatenate([r_rot_cont6d, cont6d], axis=-1)
    cont6d = cont6d.reshape((-1, joints_num, 6))
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos.reshape((-1, 3)))


# --- Skeleton -----------------------------------------------------------------


class Skeleton:
    """Chain-based FK/IK over a fixed kinematic tree (skeleton.py:4-186).

    Offsets are held as a plain array; all methods are pure and jittable —
    chain walks unroll at trace time (chains are short static lists)."""

    def __init__(self, raw_offsets: np.ndarray, kinematic_tree):
        self._raw_offset = np.asarray(raw_offsets, dtype=np.float64)
        self._tree = [list(c) for c in kinematic_tree]
        self._offset = None
        parents = [0] * len(self._raw_offset)
        parents[0] = -1
        for chain in self._tree:
            for j in range(1, len(chain)):
                parents[chain[j]] = chain[j - 1]
        self._parents = parents

    @property
    def parents(self):
        return list(self._parents)

    def njoints(self) -> int:
        return len(self._raw_offset)

    def set_offset(self, offsets) -> None:
        self._offset = jnp.asarray(offsets)

    def get_offsets_joints(self, joints: jnp.ndarray) -> jnp.ndarray:
        """Scale unit raw offsets by the bone lengths of a reference pose
        (J, 3) — vectorized gather over parents instead of a joint loop."""
        parent_idx = jnp.array([max(p, 0) for p in self._parents])
        lengths = jnp.linalg.norm(joints - joints[parent_idx], axis=-1)
        lengths = lengths.at[0].set(1.0)
        offsets = jnp.asarray(self._raw_offset) * lengths[:, None]
        offsets = offsets.at[0].set(jnp.asarray(self._raw_offset)[0])
        self._offset = offsets
        return offsets

    def inverse_kinematics(self, joints: jnp.ndarray, face_joint_idx,
                           smooth_forward: bool = False) -> jnp.ndarray:
        """Global positions (T, J, 3) -> local quaternions (T, J, 4)
        (skeleton.py:54-102)."""
        l_hip, r_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
        across = across / jnp.linalg.norm(across, axis=-1, keepdims=True)
        forward = jnp.cross(jnp.array([[0.0, 1.0, 0.0]]), across)
        if smooth_forward:
            from scipy.ndimage import gaussian_filter1d

            forward = jnp.asarray(
                gaussian_filter1d(np.asarray(forward), 20, axis=0, mode="nearest"))
        forward = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)

        target = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), forward.shape)
        root_quat = qbetween(forward, target)
        root_quat = root_quat.at[0].set(jnp.array([1.0, 0.0, 0.0, 0.0]))

        quat_params = jnp.zeros(joints.shape[:-1] + (4,))
        quat_params = quat_params.at[:, 0].set(root_quat)
        for chain in self._tree:
            rot = root_quat
            for j in range(len(chain) - 1):
                u = jnp.broadcast_to(
                    jnp.asarray(self._raw_offset[chain[j + 1]]), (len(joints), 3))
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
                rot_u_v = qbetween(u, v)
                local = qmul(qinv(rot), rot_u_v)
                quat_params = quat_params.at[:, chain[j + 1]].set(local)
                rot = qmul(rot, local)
        return quat_params

    def _offsets_for(self, batch: int, skel_joints=None) -> jnp.ndarray:
        if skel_joints is not None:
            if skel_joints.ndim == 3:
                parent_idx = jnp.array([max(p, 0) for p in self._parents])
                lengths = jnp.linalg.norm(
                    skel_joints - skel_joints[:, parent_idx], axis=-1)
                lengths = lengths.at[:, 0].set(1.0)
                offsets = jnp.asarray(self._raw_offset)[None] * lengths[..., None]
                offsets = offsets.at[:, 0].set(jnp.asarray(self._raw_offset)[0])
                self._offset = offsets
            else:
                self.get_offsets_joints(skel_joints)
        if self._offset is None:
            raise ValueError("set_offset/get_offsets_joints must run first")
        off = jnp.asarray(self._offset)
        if off.ndim == 2:
            off = jnp.broadcast_to(off, (batch,) + off.shape)
        return off

    def forward_kinematics(self, quat_params: jnp.ndarray, root_pos: jnp.ndarray,
                           skel_joints=None, do_root_R: bool = True) -> jnp.ndarray:
        """Local quats (B, J, 4) + root pos (B, 3) -> joints (B, J, 3)."""
        offsets = self._offsets_for(quat_params.shape[0], skel_joints)
        joints = jnp.zeros(quat_params.shape[:-1] + (3,))
        joints = joints.at[:, 0].set(root_pos)
        for chain in self._tree:
            if do_root_R:
                rot = quat_params[:, 0]
            else:
                rot = jnp.broadcast_to(
                    jnp.array([1.0, 0.0, 0.0, 0.0]), (quat_params.shape[0], 4))
            for i in range(1, len(chain)):
                rot = qmul(rot, quat_params[:, chain[i]])
                joints = joints.at[:, chain[i]].set(
                    qrot(rot, offsets[:, chain[i]]) + joints[:, chain[i - 1]])
        return joints

    def forward_kinematics_cont6d(self, cont6d_params: jnp.ndarray,
                                  root_pos: jnp.ndarray, skel_joints=None,
                                  do_root_R: bool = True) -> jnp.ndarray:
        """cont6d (B, J, 6) + root pos (B, 3) -> joints (B, J, 3)."""
        offsets = self._offsets_for(cont6d_params.shape[0], skel_joints)
        joints = jnp.zeros(cont6d_params.shape[:-1] + (3,))
        joints = joints.at[:, 0].set(root_pos)
        for chain in self._tree:
            if do_root_R:
                mat = cont6d_to_matrix(cont6d_params[:, 0])
            else:
                mat = jnp.broadcast_to(
                    jnp.eye(3), (cont6d_params.shape[0], 3, 3))
            for i in range(1, len(chain)):
                mat = mat @ cont6d_to_matrix(cont6d_params[:, chain[i]])
                step = (mat @ offsets[:, chain[i]][..., None])[..., 0]
                joints = joints.at[:, chain[i]].set(step + joints[:, chain[i - 1]])
        return joints
