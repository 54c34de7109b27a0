"""AllegroHand: 4-finger 16-DoF in-hand reorientation.

Parity target: reference isaacgymenvs/tasks/allegro_hand.py (obs dims 50/
72/88 :108-112, all dofs actuated :245, drive props stiffness 3 / damping
0.1 / effort 0.5 :263-266, hand start rotation :285, object offsets
dy=-0.2 dz=0.06 :290-292, same reward/goal machinery as ShadowHand) and
cfg/task/AllegroHand.yaml.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import maths
from ..model import load_urdf
from ..model.compose import compose
from ..utils.assets import asset_path
from .shadow_hand import ShadowHand


def _axis_angle(axis, angle):
    axis = np.asarray(axis, np.float64)
    s = np.sin(angle / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, np.cos(angle / 2)])


def _qmul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


class AllegroHand(ShadowHand):
    fingertip_names = (
        "index_biotac_tip", "middle_biotac_tip", "ring_biotac_tip",
        "thumb_biotac_tip",
    )

    def __init__(self, cfg):
        env = cfg["env"]
        env.setdefault("episodeLength", 600)
        env.setdefault("observationType", "full_state")
        # AllegroHand obs dims differ from ShadowHand
        # "no_vel" is the reference's dextreme-era name for the same layout
        self._allegro_dims = {"no_vel": 50, "full_no_vel": 50, "full": 72, "full_state": 88}
        super().__init__(cfg)
        self.num_obs = self._allegro_dims[self.obs_type]
        self.num_states = 88 if self.asymmetric_obs else 0
        self.num_acts = 16

    def dr_actor_ranges(self):
        """Scope DR actor_params to the hand vs object bodies (the
        reference's per-actor-handle property randomization)."""
        return getattr(self, "_actor_ranges", None)

    def obs_spec(self):
        """{key: (offset, size)} view of the flat no-vel obs vector using
        the reference's dict-observation key names (per-key DR noise,
        AllegroHandLSTM.yaml observations.dof_pos/object_pose_cam/...)."""
        if self.obs_type not in ("no_vel", "full_no_vel"):
            return None
        return {
            "dof_pos": (0, 16),
            "object_pose_cam": (16, 7),
            "goal_pose": (23, 7),
            "goal_relative_rot_cam": (30, 4),
            "last_actions": (34, 16),
        }

    def build_model(self):
        env = self.cfg["env"]
        asset = env.get("asset", {}).get(
            "assetFileName", "urdf/kuka_allegro_description/allegro_touch_sensor.urdf"
        )
        hand = load_urdf(asset_path(asset), fix_base=True)
        # drive props on all 16 dofs (reference allegro_hand.py:263-266)
        nv = hand.nv
        hand = hand.replace(
            dof_stiffness=jnp.full(nv, 3.0),
            dof_damping=jnp.full(nv, 0.1),
            dof_max_effort=jnp.full(nv, 0.5),
        )

        obj_file = env.get("asset", {}).get(
            "assetFileNameBlock", "urdf/objects/cube_multicolor_allegro.urdf"
        )
        obj = load_urdf(asset_path(obj_file))
        model, refs = compose([hand, obj], ["", "object:"])
        self.hand_ref, self.obj_ref = refs
        self._actor_ranges = {
            "hand": (0, self.obj_ref.body0),
            "object": (self.obj_ref.body0, self.obj_ref.body0 + obj.nbody),
        }

        # hand root pose: z=0.5 with Ry(pi)*Rx(0.47pi)*Rz(0.25pi)
        # (reference allegro_hand.py:283-285; gymapi quat product applies
        # the RIGHT operand first)
        rot = _qmul(
            _axis_angle((0, 1, 0), np.pi),
            _qmul(
                _axis_angle((1, 0, 0), 0.47 * np.pi),
                _axis_angle((0, 0, 1), 0.25 * np.pi),
            ),
        )
        model = model.replace(
            body_pos=model.body_pos.at[0].set(jnp.array([0.0, 0.0, 0.5])),
            body_quat=model.body_quat.at[0].set(jnp.asarray(rot, jnp.float32)),
        )

        hand_pts = tuple(
            c for c in range(model.ncp) if model.cpoint_body[c] < self.obj_ref.body0
        )
        obj_geom = next(
            g for g in range(model.ngeom) if model.geom_body[g] >= self.obj_ref.body0
        )
        model = model.replace(
            ppair_point=hand_pts,
            ppair_geom=tuple(obj_geom for _ in hand_pts),
            plane_contacts=False,
        )
        return model, self.sim_params_from_cfg()

    def _setup_indices(self):
        super()._setup_indices()
        # all dofs actuated (allegro_hand.py:245); override ShadowHand's
        # actuator-derived subset (the urdf has no actuators)
        self.actuated_idx = jnp.arange(self.num_hand_dofs)
        # object spawn: hand z (0.5) + startObjectPoseDY/DZ offsets
        # (reference allegro_hand.py:288-292; cfg overrides e.g. -0.19)
        dy = float(self.cfg["env"].get("startObjectPoseDY", -0.2))
        dz = float(self.cfg["env"].get("startObjectPoseDZ", 0.06))
        self.object_start_pos = jnp.array([0.0, dy, 0.5 + dz])
        self.goal_start_pos = self.object_start_pos + jnp.array([0.0, 0.0, -0.04])

    def _obs_impl(self, q, qd, kin, sensors, task, actions, obs_type):
        obj_pos, obj_rot, obj_linvel, obj_angvel = self._object_state(q, qd)
        goal_rot = task["goal_rot"]
        goal_pos = self.goal_start_pos
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(goal_rot))
        dof_pos = q[self.hand_q_idx]
        dof_vel = qd[jnp.asarray(self.scalar_dof_indices)]
        scaled_pos = maths.unscale(dof_pos, self.dof_lower, self.dof_upper)

        if obs_type in ("full_no_vel", "no_vel"):
            return jnp.concatenate(
                [scaled_pos, obj_pos, obj_rot, goal_pos, goal_rot, quat_diff, actions]
            )
        if obs_type == "full":
            return jnp.concatenate(
                [
                    scaled_pos,
                    self.vel_obs_scale * dof_vel,
                    obj_pos,
                    obj_rot,
                    obj_linvel,
                    self.vel_obs_scale * obj_angvel,
                    goal_pos,
                    goal_rot,
                    quat_diff,
                    actions,
                ]
            )
        # full_state (88)
        dof_force = sensors.dof_force[jnp.asarray(self.scalar_dof_indices)]
        return jnp.concatenate(
            [
                scaled_pos,
                self.vel_obs_scale * dof_vel,
                self.force_torque_obs_scale * dof_force,
                obj_pos,
                obj_rot,
                obj_linvel,
                self.vel_obs_scale * obj_angvel,
                goal_pos,
                goal_rot,
                quat_diff,
                actions,
            ]
        )
