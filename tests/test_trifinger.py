"""Trifinger depth tests: MDP spec-driven obs normalization, position
command mode, safety damping, success stats (reference trifinger.py
:326-352 specs, :592-707 spaces, :1000-1043 torque pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map


def make(n=2, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    # randomize defaults to True (reference parity); these are
    # deterministic behavior tests, so pin DR off
    cfg = load_config(
        ["task=Trifinger", f"num_envs={n}", "task.task.randomize=False"]
    )["task"]
    cfg["env"].update(env_kw)
    return task_map["Trifinger"](cfg)


@pytest.mark.slow
def test_spec_dims_and_normalized_obs():
    env = make()
    assert env.num_obs == sum(env.OBS_SPEC.values()) == 41
    assert env.num_states == 41 + sum(env.STATE_EXTRA_SPEC.values()) == 113
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, rew, done, ex = step(
            state, jnp.zeros((2, 9))
        )
    o = np.asarray(obs)
    # normalize_obs: every in-range quantity maps into [-1, 1] (joint
    # velocities can overshoot transiently; joint pos / poses cannot)
    assert (np.abs(o[:, :9]) <= 1.01).all()  # robot_q
    assert (np.abs(o[:, 18:32]) <= 1.5).all()  # object + goal pose
    # success stats surfaced
    assert {"successes", "successes_pos", "successes_quat"} <= set(ex)


@pytest.mark.slow
def test_position_command_mode_tracks_targets():
    """Position command mode PD-tracks the commanded pose far better
    than uncontrolled joints (the 0.36 Nm motors with kp=10 sag a bit
    under gravity by design -- they do on the real platform too)."""
    tgt = None

    def error(command_mode, act):
        nonlocal tgt
        env = make(command_mode=command_mode, apply_safety_damping=False)
        state, obs = env.reset(jax.random.PRNGKey(1))
        step = jax.jit(env.step)
        tgt = np.asarray(env.default_dof)
        if act == "default":
            a = 2.0 * (env.default_dof - env.action_lo) / (
                env.action_hi - env.action_lo
            ) - 1.0
            a = jnp.broadcast_to(a, (2, 9))
        else:
            a = jnp.zeros((2, 9))
        for _ in range(40):
            state, obs, rew, done, ex = step(state, a)
        qj = np.asarray(state.sim.q)[:, np.asarray(env.q_idx)]
        # judge the upper+middle joints: the lower (tip) joints curl into
        # table/object contact at the default pose and rail against it
        # with only 0.36 Nm of authority (the real platform does too)
        sel = np.asarray([0, 1, 3, 4, 6, 7])
        return float(np.abs(qj - tgt)[:, sel].mean())

    tracked = error("position", "default")
    free = error("torque", "zero")  # zero torques: gravity wins
    assert tracked < 0.2, tracked
    assert tracked < free * 0.5, (tracked, free)


@pytest.mark.slow
def test_safety_damping_slows_joints():
    """With safety damping the joints bleed velocity faster under zero
    torque commands (reference :1033-1041)."""

    def peak_speed(safety):
        env = make(apply_safety_damping=safety)
        state, obs = env.reset(jax.random.PRNGKey(2))
        qd = state.sim.qd.at[:, np.asarray(env.v_idx)].set(5.0)
        state = state.replace(sim=state.sim.replace(qd=qd))
        step = jax.jit(env.step)
        for _ in range(10):
            state, obs, rew, done, ex = step(state, jnp.zeros((2, 9)))
        return float(
            np.abs(np.asarray(state.sim.qd)[:, np.asarray(env.v_idx)]).max()
        )

    assert peak_speed(True) < peak_speed(False) - 0.2


def test_obs_spec_dict_view():
    """Per-component observation dict (reference __configure_mdp_spaces
    component names) through the framework dict-obs API."""
    env = make()
    assert env.observation_dict_space == dict(env.OBS_SPEC)
    state, obs = env.reset(jax.random.PRNGKey(1))
    d = env.obs_dict(obs)
    assert set(d) == set(env.OBS_SPEC)
    assert all(d[k].shape == (2, n) for k, n in env.OBS_SPEC.items())
