"""SMPL LBS + Rotation2xyz tests.

The reference wraps `smplx` + the licensed SMPL_NEUTRAL.pkl artifact —
neither is in this environment — so the LBS math is cross-checked
against an independent numpy implementation written directly from the
smplx equations, plus analytic properties (rest pose, rigid global
rotation, blendshape linearity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from diffusestylegesture_tpu.models import smpl as S


def random_model(rng, V=40, J=24, betas=6, extra=9):
    return S.SmplModel(
        v_template=jnp.asarray(rng.standard_normal((V, 3))),
        shapedirs=jnp.asarray(0.1 * rng.standard_normal((V, 3, betas))),
        posedirs=jnp.asarray(0.01 * rng.standard_normal(((J - 1) * 9, V * 3))),
        j_regressor=jnp.asarray(rng.dirichlet(np.ones(V), J)),
        lbs_weights=jnp.asarray(rng.dirichlet(np.ones(J), V)),
        parents=tuple(S.SMPL_PARENTS),
        j_regressor_extra=jnp.asarray(rng.dirichlet(np.ones(V), extra)),
    )


def numpy_lbs(model, betas, rot_mats):
    """Independent reference: smplx lbs() equations, plain loops."""
    v_template = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    j_reg = np.asarray(model.j_regressor)
    weights = np.asarray(model.lbs_weights)
    parents = list(model.parents)
    B, J = rot_mats.shape[:2]
    out_v, out_j = [], []
    for b in range(B):
        v_shaped = v_template + np.einsum("l,vcl->vc", betas[b], shapedirs)
        j_rest = j_reg @ v_shaped
        pose_feature = (rot_mats[b, 1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feature @ posedirs).reshape(-1, 3)
        # forward kinematics with homogeneous transforms
        G = np.zeros((J, 4, 4))
        for j in range(J):
            A = np.eye(4)
            A[:3, :3] = rot_mats[b, j]
            A[:3, 3] = j_rest[j] - (j_rest[parents[j]] if parents[j] >= 0 else 0)
            G[j] = A if parents[j] < 0 else G[parents[j]] @ A
        # subtract rest-pose joint contribution
        Gk = G.copy()
        for j in range(J):
            Gk[j, :3, 3] -= G[j, :3, :3] @ j_rest[j]
        T = np.einsum("vj,jxy->vxy", weights, Gk)
        vh = np.concatenate([v_posed, np.ones((len(v_posed), 1))], axis=1)
        verts = np.einsum("vxy,vy->vx", T, vh)[:, :3]
        out_v.append(verts)
        # smplx returns the kinematic J_transformed (FK joint positions),
        # not a re-regression from the skinned vertices
        out_j.append(G[:, :3, 3].copy())
    return np.stack(out_v), np.stack(out_j)


@pytest.fixture(scope="module")
def model():
    return random_model(np.random.default_rng(0))


class TestLBS:
    def test_vs_independent_numpy(self, model):
        rng = np.random.default_rng(1)
        B = 3
        betas = rng.standard_normal((B, 6))
        rotvecs = 0.4 * rng.standard_normal((B, 24, 3))
        rot_mats = Rotation.from_rotvec(rotvecs.reshape(-1, 3)).as_matrix().reshape(B, 24, 3, 3)
        v_ref, j_ref = numpy_lbs(model, betas, rot_mats)
        v, j = S.lbs(model, jnp.asarray(betas), jnp.asarray(rot_mats))
        np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j), j_ref, atol=1e-5)

    def test_rest_pose_identity(self, model):
        eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        v, j = S.lbs(model, jnp.zeros((1, 6)), eye)
        np.testing.assert_allclose(
            np.asarray(v[0]), np.asarray(model.v_template), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(j[0]),
            np.asarray(model.j_regressor @ model.v_template), atol=1e-5)

    def test_global_rotation_is_rigid(self, model):
        rmat = Rotation.from_euler("XYZ", [0.3, -0.2, 0.5]).as_matrix()
        rots = np.broadcast_to(np.eye(3), (1, 24, 3, 3)).copy()
        rots[0, 0] = rmat
        v_rot, _ = S.lbs(model, jnp.zeros((1, 6)), jnp.asarray(rots))
        v_rest, j_rest = S.lbs(
            model, jnp.zeros((1, 6)),
            jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3)))
        root = np.asarray(j_rest[0, 0])
        expected = (np.asarray(v_rest[0]) - root) @ rmat.T + root
        np.testing.assert_allclose(np.asarray(v_rot[0]), expected, atol=1e-4)

    def test_rodrigues_vs_scipy(self):
        rng = np.random.default_rng(2)
        vecs = rng.standard_normal((50, 3))
        ours = np.asarray(S.batch_rodrigues(jnp.asarray(vecs)))
        ref = Rotation.from_rotvec(vecs).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestSmplJoints:
    def test_maps_and_shapes(self, model):
        sj = S.SmplJoints(model)
        rng = np.random.default_rng(3)
        body = Rotation.from_rotvec(
            0.2 * rng.standard_normal((2 * 23, 3))).as_matrix().reshape(2, 23, 3, 3)
        glob = Rotation.from_rotvec(
            0.2 * rng.standard_normal((2, 3))).as_matrix()
        out = sj(jnp.asarray(body), jnp.asarray(glob), jnp.zeros((2, 6)))
        assert out["vertices"].shape == (2, 40, 3)
        assert out["smpl"].shape == (2, 24, 3)
        assert out["a2m"].shape == (2, 18, 3)
        assert out["vibe"].shape == (2, len(S.JOINT_NAMES), 3)
        # vibe joints index into 45+3 stacked joints without error
        assert np.isfinite(np.asarray(out["vibe"])).all()

    def test_requires_extra_regressor_for_high_indices(self):
        # indices 45..53 exist only if J_regressor_extra provides 9 rows;
        # with 3 the wrapper must refuse (jnp gathers would clamp silently)
        model = random_model(np.random.default_rng(4), extra=3)
        sj = S.SmplJoints(model)
        with pytest.raises(ValueError, match="extra regressor|SPIN"):
            sj(jnp.broadcast_to(jnp.eye(3), (1, 23, 3, 3)),
               jnp.broadcast_to(jnp.eye(3), (1, 3, 3)), jnp.zeros((1, 6)))


class TestRotation2xyz:
    @pytest.fixture(scope="class")
    def r2x(self, model):
        return S.Rotation2xyz(S.SmplJoints(model))

    def test_rot6d_path(self, r2x):
        rng = np.random.default_rng(5)
        B, J, T = 2, 25, 4  # 24 rots + 1 translation row
        x = rng.standard_normal((B, J, 6, T)).astype(np.float32)
        out = r2x(jnp.asarray(x), None, pose_rep="rot6d", translation=True,
                  glob=True, jointstype="smpl", vertstrans=True)
        assert out.shape == (2, 24, 3, T)
        # root-centering before translation add-back: at t=0 root is origin
        np.testing.assert_allclose(np.asarray(out[:, 0, :, 0]), 0, atol=1e-5)

    def test_xyz_passthrough_and_errors(self, r2x):
        x = jnp.zeros((1, 5, 3, 2))
        assert r2x(x, None, "xyz", False, True, "smpl", False) is x
        with pytest.raises(NotImplementedError):
            r2x(x, None, "rot6d", False, True, "bogus", False)
        with pytest.raises(TypeError):
            r2x(x, None, "rot6d", False, False, "smpl", False)

    def test_rotvec_vs_rotmat_consistency(self, r2x):
        rng = np.random.default_rng(6)
        B, T = 1, 3
        rotvecs = 0.3 * rng.standard_normal((B, 24, 3, T))
        out_vec = r2x(jnp.asarray(rotvecs), None, "rotvec", False, True,
                      "smpl", False)
        mats = np.zeros((B, 24, 9, T))
        for t in range(T):
            mats[0, :, :, t] = Rotation.from_rotvec(
                rotvecs[0, :, :, t]).as_matrix().reshape(24, 9)
        out_mat = r2x(jnp.asarray(mats), None, "rotmat", False, True,
                      "smpl", False)
        np.testing.assert_allclose(
            np.asarray(out_vec), np.asarray(out_mat), atol=1e-4)

    def test_mask_zeroes_frames(self, r2x):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, 24, 6, 4)).astype(np.float32)
        mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        out = r2x(jnp.asarray(x), mask, "rot6d", False, True, "vertices", False)
        assert np.abs(np.asarray(out[..., 2:])).max() == 0
        assert np.abs(np.asarray(out[..., :2])).max() > 0
