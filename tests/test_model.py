"""Model-parsing tests: the MJCF/URDF subset the reference assets use."""
import numpy as np
import pytest

from isaacgymenvs_tpu.model import FIXED, FREE, HINGE, SLIDE, load_mjcf, load_urdf
from isaacgymenvs_tpu.utils.assets import asset_path


def test_cartpole_urdf():
    m = load_urdf(asset_path("urdf/cartpole.urdf"), fix_base=True)
    # slider fixed to world, cart prismatic, pole revolute
    assert m.nbody == 3
    assert m.jnt_type == (FIXED, SLIDE, HINGE)
    assert m.nq == 2 and m.nv == 2
    assert m.body_names == ("slider", "cart", "pole")
    # cart slides along y
    np.testing.assert_allclose(np.asarray(m.jnt_axis[1]), [0, 1, 0], atol=1e-6)
    # pole hinge about x at cart offset 0.12
    np.testing.assert_allclose(np.asarray(m.jnt_axis[2]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.body_pos[2]), [0.12, 0, 0], atol=1e-6)
    # masses: cart 1, pole 1 (inertials); slider mass derived from its
    # rail geometry at default density (it is welded, so value is inert)
    np.testing.assert_allclose(np.asarray(m.body_mass)[1:], [1.0, 1.0], atol=1e-6)
    # pole com at z=0.47, rotational inertia derived from the collision box
    np.testing.assert_allclose(np.asarray(m.body_ipos[2]), [0, 0, 0.47], atol=1e-6)
    ixx = float(m.body_inertia[2][0, 0])
    assert abs(ixx - (0.06**2 + 1.0**2) / 12.0) < 1e-4  # m=1 box 0.04x0.06x1.0
    # prismatic limit +-4
    lo, hi = float(m.dof_limit_lower[0]), float(m.dof_limit_upper[0])
    assert (lo, hi) == (-4.0, 4.0)
    # continuous joint unlimited
    assert float(m.dof_limited[1]) == 0.0


def test_ant_mjcf():
    m = load_mjcf(asset_path("mjcf/nv_ant.xml"))
    # torso free joint + 8 hinges, one body per joint
    assert m.nbody == 9
    assert m.jnt_type[0] == FREE
    assert all(t == HINGE for t in m.jnt_type[1:])
    assert m.nq == 7 + 8 and m.nv == 6 + 8
    assert m.nu == 8
    # actuator gear 15 on every motor (read as motor_effort by the reference,
    # ant.py:158-161)
    np.testing.assert_allclose(np.asarray(m.gear), 15.0)
    # hinge ranges in radians (hip: +-40 deg)
    hip1 = m.dof_joint_names().index("hip_1")
    np.testing.assert_allclose(
        float(m.dof_limit_lower[hip1]), -40 * np.pi / 180, atol=1e-5
    )
    # default joint params from <default>
    assert abs(float(m.armature[6]) - 0.01) < 1e-6
    assert abs(float(m.dof_damping[6]) - 0.1) < 1e-6
    # geoms: torso sphere + 4 aux capsules + 8 leg capsules = 13
    assert m.ngeom == 13
    # density-5 mass: torso sphere r=0.25 -> m = 5*4/3*pi*0.25^3
    torso_mass = float(m.body_mass[0])
    sphere_m = 5.0 * 4 / 3 * np.pi * 0.25**3
    assert torso_mass > sphere_m  # sphere + 4 capsule halves
    # init_qpos from <custom>: z=0.55, identity quat (wxyz -> xyzw)
    q0 = np.asarray(m.qpos0)
    np.testing.assert_allclose(q0[:3], [0, 0, 0.55], atol=1e-6)
    np.testing.assert_allclose(q0[3:7], [0, 0, 0, 1], atol=1e-6)
    # contact candidate points: sphere 1 + capsules 2 each = 1 + 12*2 = 25
    assert m.ncp == 25
    # capsule fromto produced correct world-ish endpoints in body frame:
    # front_left_foot ankle capsule endpoints at (0,0,0) and (0.4,0.4,0)
    feet = [i for i, n in enumerate(m.body_names) if "foot" in n]
    assert len(feet) == 4


def test_humanoid_mjcf_parses():
    m = load_mjcf(asset_path("mjcf/nv_humanoid.xml"))
    # 21 actuated dofs + free root
    assert m.nv == 6 + 21
    assert m.nu == 21
    # multi-joint bodies were expanded into massless chains
    assert m.jnt_type[0] == FREE
    assert any("__f" in n for n in m.body_names)
    # stiffness defaults from nested classes reached the dofs
    names = m.dof_joint_names()
    abd_z = names.index("abdomen_z")
    assert abs(float(m.dof_stiffness[abd_z]) - 20.0) < 1e-6  # big_stiff_joint
    assert abs(float(m.armature[abd_z]) - 0.02) < 1e-6
    knee = names.index("right_knee")
    assert abs(float(m.dof_stiffness[knee]) - 5.0) < 1e-6  # class "body" default
    # masses positive and finite
    total = float(np.sum(np.asarray(m.body_mass)))
    assert 30.0 < total < 120.0
