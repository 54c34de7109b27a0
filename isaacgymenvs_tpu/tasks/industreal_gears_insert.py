"""IndustRealTaskGearsInsert: medium-gear-onto-shaft insertion with the
SAPU / SDF-reward / SBC layer, as a thin specialization of PegsInsert.

Parity targets:
  * reference isaacgymenvs/tasks/industreal/industreal_task_gears_insert.py
    (frames :162-172, obs :280-347, reward :350-477, resets :513-730,
    grasp pose :762-814);
  * industreal_env_gears.py (gear/base actors; asset dims from
    assets/industreal/yaml/industreal_asset_info_gears.yaml);
  * cfg/task/IndustRealTaskGearsInsert.yaml.

The gear meshes live in one shared assembly frame: the gear base spans
x in [-0.075, 0.075] with its three shafts at x = -0.03 / +0.02 / +0.05,
and each gear OBJ sits assembled over its shaft (medium gear centered at
x = +0.02 -- the reference recovers this as gear_medium_pos_center =
gear_pos - [gear_medium_pos_offset[1], 0, 0], task:166). Keypoints and
engagement checks therefore hang off the CENTER frames (actor origin +
rotated [0.02, 0, 0]); SDF queries keep using the actor-origin poses,
which are the mesh frames the grids were voxelized in.

Documented divergences (beyond the PegsInsert-family ones):
  * the small and large gears are NOT simulated. The reference spawns
    them as free actors but resets them to the assembled pose every
    episode and never manipulates them; their only physical role is
    tooth meshing with the medium gear, which requires them to spin
    freely on their shafts (a welded-obstacle approximation was tried
    and JAMS insertion: interlocked teeth against an immovable neighbor
    block both yaw and descent). Contact is therefore gear-vs-base only
    -- bore/hub sample points against the base+shafts SDF -- matching
    what the reference's SAPU layer measures (shaft_files=[base_file],
    env_gears.py:190);
  * the center offset is rotated by the actor quaternion (the reference
    subtracts a constant unrotated offset, exact only at zero yaw).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import dynamics as _dyn
from ..model.compose import compose
from ..model.spec import FREE, GEOM_CYLINDER, ModelBuilder
from ..sdf.builder import (
    add_contact_points,
    attach_sdf,
    load_obj,
    mesh_to_sdf,
    pair_points_with_sdf,
)
from ..utils.assets import asset_path
from .. import maths
from .factory_nut_bolt import (
    FINGERPAD_LENGTH,
    FINGER_LENGTH,
    _strip_points,
)

# Denser pad sampling than the shared PAD_POINTS: the pads squeeze the
# gear's TEETH, and with few points the asymmetric tooth-flank contacts
# apply a net tilt torque that wedges the inserted gear
_PAD_Z = FINGER_LENGTH - FINGERPAD_LENGTH * np.linspace(0.06, 1.0, 5)
PAD_POINTS_DENSE = np.array(
    [[sx, 0.0, z] for z in _PAD_Z for sx in (-0.008, -0.003, 0.003, 0.008)],
    np.float32,
)
from .industreal_pegs_insert import IndustRealTaskPegsInsert

# assets/industreal/yaml/industreal_asset_info_gears.yaml
BASE_HEIGHT = 0.005
SHAFT_HEIGHT = 0.020
GEAR_HEIGHT = 0.025  # mesh z in [0.005, 0.025]
GEAR_BOTTOM_Z = 0.005
GEAR_DENSITY = 1000.0
GRASP_OFFSET = 0.017
GEAR_CENTER = np.array([0.02, 0.0, 0.0], np.float32)  # medium shaft axis
GEAR_OUTER_R = 0.021

_MESH = "industreal/mesh/industreal_gears"


@lru_cache(maxsize=None)
def _mesh(name):
    return load_obj(asset_path(f"{_MESH}/industreal_gear_{name}.obj"))


@lru_cache(maxsize=None)
def base_sdf_grid(resolution: int = 256):
    """Base-only SDF: SAPU interpenetration target (shaft_files=[base])."""
    v, t = _mesh("base")
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.05)


@lru_cache(maxsize=None)
def shaft_sdf_grid(resolution: int = 192):
    """Fine SDF cropped to the medium shaft: the shaft-bore fit is
    ~0-0.5 mm (faceted 9.5 mm shaft in a 9.5 mm bore), far below the
    0.59 mm voxels a whole-base grid affords, so the bore's contact
    narrowphase samples this 0.16 mm-voxel crop instead. Distances are
    still measured against the full base mesh."""
    v, t = _mesh("base")
    lo = GEAR_CENTER + np.array([-0.015, -0.015, 0.003])
    hi = GEAR_CENTER + np.array([0.015, 0.015, 0.032])
    return mesh_to_sdf(v, t, resolution=resolution, bounds=(lo, hi))


@lru_cache(maxsize=None)
def gear_sdf_grid(resolution: int = 160):
    v, t = _mesh("medium")
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.12)


def _pick_center_frame(pts: np.ndarray, n_z: int, n_ang: int) -> np.ndarray:
    """Stratified (z, angle-about-the-gear-axis) vertex pick."""
    rel = pts - GEAR_CENTER
    z = pts[:, 2]
    ang = np.arctan2(rel[:, 1], rel[:, 0])
    zi = np.clip(
        ((z - z.min()) / max(float(np.ptp(z)), 1e-9) * n_z).astype(int),
        0, n_z - 1,
    )
    ai = np.clip(((ang + np.pi) / (2 * np.pi) * n_ang).astype(int), 0, n_ang - 1)
    out = []
    for b in range(n_z * n_ang):
        sel = np.where(zi * n_ang + ai == b)[0]
        if len(sel):
            out.append(pts[sel[len(sel) // 2]])
    return np.asarray(out, np.float32)


@lru_cache(maxsize=None)
def gear_sample_points():
    """SAPU + SDF-reward sample (reference sample_mesh_points_even)."""
    v, _ = _mesh("medium")
    return _pick_center_frame(v.astype(np.float32), n_z=10, n_ang=20)


@lru_cache(maxsize=None)
def gear_contact_points():
    """(bore, bottom) contact vertex sets: dense bore wall (shaft
    engagement, paired with the fine shaft crop) + hub bottom face
    (base-plate rest, paired with the coarse base grid -- trilinear is
    exact on the flat plate top). Outer-teeth vertices are deliberately
    NOT contact sources: against the base-only SDF they see nothing, and
    pairing them with the neighbor gears' teeth would require those gears
    to spin freely (see class docstring)."""
    v, _ = _mesh("medium")
    v = v.astype(np.float32)
    r = np.hypot(v[:, 0] - GEAR_CENTER[0], v[:, 1])
    bore = v[r < r.min() + 0.0015]
    # hub bottom + outer-rim bottom ring: without the rim ring a tilted
    # gear's teeth edge (r=0.021, no points) sinks through the plate
    bottom = v[(v[:, 2] < GEAR_BOTTOM_Z + 0.002) & (r < 0.013)]
    rim = v[(v[:, 2] < GEAR_BOTTOM_Z + 0.002) & (r > GEAR_OUTER_R - 0.003)]
    return (
        _pick_center_frame(bore, n_z=5, n_ang=10),
        np.concatenate([
            _pick_center_frame(bottom, n_z=1, n_ang=12),
            _pick_center_frame(rim, n_z=1, n_ang=12),
        ]),
    )


def build_gear():
    """Medium gear as a free body; collision comes from the SDF-paired
    contact points, so the proxy geom only sets mass/inertia (annulus
    approximated as a solid cylinder about the gear axis)."""
    b = ModelBuilder()
    r, h = GEAR_OUTER_R, GEAR_HEIGHT - GEAR_BOTTOM_Z
    m = np.pi * r * r * h * GEAR_DENSITY * 0.7  # ~30% bore/teeth void
    izz = 0.5 * m * r * r
    ixx = m / 12.0 * (3 * r * r + h * h)
    ipos = GEAR_CENTER + np.array([0.0, 0.0, GEAR_BOTTOM_Z + h / 2])
    body = b.add_body(
        parent=-1, name="gear", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=m, ipos=tuple(ipos),
        inertia=np.diag([ixx, ixx, izz]),
    )
    b.qpos0_free[body] = (
        np.array([0.5, 0.0, SHAFT_HEIGHT], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    b.add_geom(
        body, GEOM_CYLINDER, tuple(ipos), (0, 0, 0, 1),
        (r, h / 2, 0.0), friction=1.0,
    )
    return b.finalize()


class IndustRealTaskGearsInsert(IndustRealTaskPegsInsert):
    """Gear-onto-shaft insertion: PegsInsert's SAPU/SDF-reward/SBC flow
    with gear/base assets, center-offset frames, and the gears-task
    engagement geometry (gear origin below base+shaft top, task:433-437)."""

    def __init__(self, cfg):
        env = cfg.get("env", {})
        off = env.get("gear_medium_pos_offset", [-0.05, -0.02, 0.03])
        # reference: center = pos - [offset[1], 0, 0] (task:166)
        self.center_off = jnp.asarray([-float(off[1]), 0.0, 0.0])
        # map the gears cfg names onto the pegs-task knob names
        env.setdefault("socket_pos_obs_noise",
                       env.get("base_pos_obs_noise", [0.001, 0.001, 0.0]))
        r = cfg.setdefault("randomize", {})
        r.setdefault("socket_pos_xy_initial",
                     r.get("base_pos_xy_initial", [0.5, 0.0]))
        r.setdefault("socket_pos_xy_noise",
                     r.get("base_pos_xy_noise", [0.1, 0.1]))
        r.setdefault("socket_pos_z_noise_bounds",
                     r.get("base_pos_z_noise_bounds", [0.0, 0.05]))
        r.setdefault("socket_rot_noise", [0.0, 0.0, 0.0])  # base_quat = identity
        r.setdefault("plug_pos_xy_noise",
                     (r.get("gear_pos_xyz_noise") or [0.01, 0.01, 0.0])[:2])
        super().__init__(cfg)

    # ---- model ----------------------------------------------------------
    def build_model(self):
        from ..model import load_urdf

        franka = load_urdf(
            asset_path("urdf/franka_description/robots/franka_panda.urdf"),
            fix_base=True,
        )
        nv = franka.nv
        stiff = np.zeros(nv, np.float32)
        damp = np.zeros(nv, np.float32)
        stiff[nv - 2:] = 500.0
        damp[nv - 2:] = 2.0
        franka = franka.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        from .industreal_pegs_insert import build_socket

        model, refs = compose(
            [franka, build_gear(), build_socket()], ["", "gear:", "base:"]
        )
        self.franka_ref, self.plug_ref, self.socket_ref = refs
        plug_body = self.plug_ref.body0
        socket_body = self.socket_ref.body0 + 3  # yaw child of 3 slides
        lf = model.body_names.index("panda_leftfinger")
        rf = model.body_names.index("panda_rightfinger")
        model = _strip_points(model, set(range(model.nbody)))
        # gear bore points vs the fine shaft crop; hub bottom points vs
        # the coarse whole-base grid (plate-top rest)
        bore_pts, bottom_pts = gear_contact_points()
        model, bore_idx = add_contact_points(
            model, plug_body, bore_pts, friction=0.5
        )
        model, bot_idx = add_contact_points(
            model, plug_body, bottom_pts, friction=0.5
        )
        model, shaft_g = attach_sdf(model, socket_body, shaft_sdf_grid())
        model, base_g = attach_sdf(model, socket_body, base_sdf_grid())
        model = pair_points_with_sdf(model, bore_idx, shaft_g)
        model = pair_points_with_sdf(model, bot_idx, base_g)
        # finger pads vs gear SDF (grip force transmission)
        model, lf_idx = add_contact_points(
            model, lf, PAD_POINTS_DENSE, friction=1.0
        )
        model, rf_idx = add_contact_points(
            model, rf, PAD_POINTS_DENSE, friction=1.0
        )
        model, gear_g = attach_sdf(model, plug_body, gear_sdf_grid())
        model = pair_points_with_sdf(model, lf_idx + rf_idx, gear_g)
        self.plug_body, self.socket_body = plug_body, socket_body
        return model, self.sim_params_from_cfg()

    def _setup(self):
        super()._setup()
        # engaged when the gear origin is below base+shaft top (task:433)
        self.engage_top_offset = BASE_HEIGHT + SHAFT_HEIGHT
        self.engage_base_height = 0.0

    def _algo_geometry(self):
        # SAPU target: the fine shaft crop of the base-only SDF
        # (shaft_files=[base_file], env_gears.py:190). The whole-base
        # coarse grid's ~0.6 mm trilinear noise exceeds the 1 mm SAPU
        # threshold; shaft-bore interpenetration -- the contact-rich
        # region SAPU exists for -- needs the 0.16 mm crop. Sample
        # points outside the crop resolve to (clamped boundary value +
        # distance-to-grid) >= 0, so they never report false penetration.
        return (
            jnp.asarray(gear_sample_points()),
            shaft_sdf_grid(),
            gear_sdf_grid(),
        )

    # ---- frames ----------------------------------------------------------
    def _centers(self, q):
        plug_pos, plug_quat = self._plug_state(q)
        socket_pos, socket_quat = self._socket_state(q)
        plug_c = plug_pos + maths.quat_rotate(plug_quat, self.center_off)
        shaft = socket_pos + maths.quat_rotate(socket_quat, self.center_off)
        return plug_c, plug_quat, shaft, socket_quat

    def _gripper_goal(self, socket_pos, socket_quat):
        """Fingertip goal: above the middle shaft at base height +
        grasp_offset (reference gripper_goal_pos_local, task:129-142)."""
        off = self.center_off + jnp.array(
            [0.0, 0.0, BASE_HEIGHT + GRASP_OFFSET]
        )
        return socket_pos + maths.quat_rotate(socket_quat, off)

    # ---- reset -----------------------------------------------------------
    def _sample(self, rng, max_disp):
        m = self.model
        ks, kz, kd, kxy, kn = jax.random.split(rng, 5)
        base_xy = self.socket_xy_initial + self.socket_xy_noise * (
            jax.random.uniform(ks, (2,)) * 2.0 - 1.0
        )
        base_z = self.socket_z_bounds[0] + (
            self.socket_z_bounds[1] - self.socket_z_bounds[0]
        ) * jax.random.uniform(kz)
        base_pos = jnp.concatenate([base_xy, base_z[None]])
        # curriculum displacement (task _reset_medium_gear :661-672)
        disp = self.curriculum_height_bound[0] + (
            max_disp - self.curriculum_height_bound[0]
        ) * jax.random.uniform(kd)
        gear_pos = base_pos + jnp.array([0.0, 0.0, SHAFT_HEIGHT]) - jnp.array(
            [0.0, 0.0, 1.0]
        ) * disp
        # xy noise only for gears not partially inserted (:692-702)
        above = gear_pos[2] > base_pos[2] + BASE_HEIGHT + SHAFT_HEIGHT
        xy_noise = self.plug_xy_noise * (jax.random.uniform(kxy, (2,)) * 2 - 1)
        gear_pos = gear_pos.at[:2].add(jnp.where(above, xy_noise, 0.0))

        q = m.qpos0
        q = q.at[self.sq: self.sq + 3].set(base_pos)
        q = q.at[self.sq + 3].set(0.0)  # base rot is identity (:606)
        q = q.at[self.pq: self.pq + 3].set(gear_pos)
        q = q.at[self.pq + 3: self.pq + 7].set(jnp.array([0.0, 0, 0, 1.0]))
        # fingers squeeze the outer teeth across the gear diameter
        fingers = jnp.full(2, GEAR_OUTER_R - 5e-4)
        grasp = (
            gear_pos
            + maths.quat_rotate(jnp.array([0.0, 0, 0, 1.0]), self.center_off)
            + jnp.array([0.0, 0.0, GRASP_OFFSET])
        )

        def ik_step(arm_q, _):
            from .. import controllers

            qq = q.at[self.q_idx[:7]].set(arm_q)
            kin = _dyn.forward_kinematics(m, qq, jnp.zeros(m.nv), self._meta)
            eef, eq, _, _ = self._fingertip(kin)
            err = controllers.pose_error(eef, eq, grasp, self.down_quat)
            J = controllers.body_jacobian(
                kin, self._anc, self._dof_body, self.hand_body, eef
            )[:, self.v_idx_np[:7]]
            dq = controllers.get_delta_dof_pos(err, J, method="dls", lam=0.1)
            return arm_q + dq, None

        arm_q, _ = jax.lax.scan(ik_step, self.arm_init, None, length=24)
        q = q.at[self.q_idx].set(jnp.concatenate([arm_q, fingers]))
        obs_noise = self.socket_pos_obs_noise * (
            jax.random.uniform(kn, (3,)) * 2.0 - 1.0
        )
        task = {
            "max_disp": max_disp,
            "obs_noise": obs_noise,
            "prev_rew": jnp.zeros(()),
            "success": jnp.zeros(()),
            "engaged": jnp.zeros(()),
        }
        return q, jnp.zeros(m.nv), task
