"""DeXtreme layer tests: RNA, corruption stack, ADR runtime integration
(reference tasks/dextreme/allegro_hand_dextreme.py + adr_vec_task.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.rna import RandomNetworkAdversary


def make(name, num_envs=8, adr_override=None, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config([f"task={name}", f"num_envs={num_envs}"])["task"]
    cfg["env"].update(env_kw)
    if adr_override is not None:
        cfg["env"]["adr"] = adr_override
    return task_map[name](cfg)


def test_rna_output_bounded_and_mask_dependent():
    rna = RandomNetworkAdversary(in_dim=23, num_actions=16, seed=3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    m1, m2 = rna.sample_mask(k1), rna.sample_mask(k2)
    x = jnp.linspace(-1, 1, 23)
    a1, a2 = rna(m1, x), rna(m2, x)
    assert a1.shape == (16,)
    assert float(jnp.abs(a1).max()) <= 1.0
    assert not bool(jnp.allclose(a1, a2))  # per-env masks diversify


@pytest.mark.parametrize(
    "name", ["AllegroHandDextremeADR", "AllegroHandDextremeManualDR"]
)
def test_dextreme_contract(name):
    env = make(name)
    assert env.num_obs == 47 and env.num_acts == 16 and env.num_states == 88
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 47)
    assert state.adr is not None
    step = jax.jit(env.step)
    for _ in range(3):
        state, obs, rew, done, ex = step(state, jnp.zeros((8, 16)))
    assert np.isfinite(np.asarray(obs)).all()
    assert ex["states"].shape == (8, 88)
    assert "adr_nats" in ex


def test_action_latency_and_affine():
    env = make("AllegroHandDextremeADR")
    ai = env._ai
    P = env.adr.P
    adr = jnp.zeros(P).at[ai["action_latency"]].set(2.0)
    hist = jnp.arange(1, 9)[:, None] * jnp.ones((8, 16)) * 0.01
    task = {
        "adr": adr,
        "act_hist": hist,
        "bias_action_u": jnp.zeros(16),
        "rna_mask": env.rna.sample_mask(jax.random.PRNGKey(1)),
        "key": jax.random.PRNGKey(2),
    }
    q = jnp.asarray(env.model.qpos0)
    a_now = jnp.full(16, 0.5)
    out = env._corrupt_action(a_now, q, task)
    # latency 2 -> the action applied is hist[1] (a_{t-2}), no noise terms
    assert np.allclose(np.asarray(out), np.asarray(hist[1]), atol=1e-6)
    # per-episode additive bias shifts the action
    task2 = dict(task)
    task2["adr"] = adr.at[ai["affine_action_additive"]].set(0.1)
    task2["bias_action_u"] = jnp.ones(16)
    out2 = env._corrupt_action(a_now, q, task2)
    assert np.allclose(np.asarray(out2 - out), 0.1, atol=1e-6)


def test_adr_ranges_evolve_through_env_steps():
    # tiny queues + short episodes: every episode end pushes a boundary
    # objective of 0 (< t_low) -> the corruption ranges must NARROW
    adr_cfg = {
        "use_adr": True,
        "update_adr_ranges": True,
        "worker_adr_boundary_fraction": 0.9,
        "adr_queue_threshold_length": 2,
        "adr_objective_threshold_low": 0.5,
        "adr_objective_threshold_high": 2.0,
        "params": {
            "affine_action_white": {
                "init_range": [0.0, 0.4],
                "limits": [0.0, 4.0],
                "delta": 0.05,
                "delta_style": "additive",
            },
        },
    }
    env = make(
        "AllegroHandDextremeADR", num_envs=64, adr_override=adr_cfg,
        episodeLength=3,
        resetTime=-1,  # resetTime>0 would override episodeLength
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    hi0 = float(state.adr.hi[0])
    step = jax.jit(env.step)
    for _ in range(20):
        state, obs, rew, done, ex = step(state, jnp.zeros((64, 16)))
    assert float(state.adr.hi[0]) < hi0
    # fresh ADR draws land inside the narrowed range
    vals = np.asarray(state.task["adr"][:, 0])
    assert vals.max() <= hi0 + 1e-6


def test_camera_sim_latches_cube_pose():
    env = make("AllegroHandDextremeADR")
    state, _ = env.reset(jax.random.PRNGKey(4))
    # pin refresh rate to 6 steps for every env
    ai = env._ai
    adr = state.task["adr"].at[:, ai["cube_pose_refresh_rate"]].set(6.0)
    adr = adr.at[:, ai["cube_obs_delay_prob"]].set(0.0)
    state = state.replace(task={**state.task, "adr": adr})
    step = jax.jit(env.step)
    s1, *_ = step(state, jnp.zeros((8, 16)))
    s2, *_ = step(s1, jnp.zeros((8, 16)))
    oq = env.obj_q
    live = np.asarray(s2.sim.q[:, oq : oq + 7])
    latched = np.asarray(s2.task["cube_obs"])
    ages = np.asarray(s2.task["cube_age"])
    # ages advance while the latch holds; latched pose != live pose
    assert (ages >= 1).all()
    assert not np.allclose(live, latched, atol=1e-5)


def test_obs_spec_matches_flat_layout():
    """The flat policy obs is the fixed-order concatenation of the
    reference's dict-observation keys (get_num_obs_dict :168)."""
    from isaacgymenvs_tpu.tasks.allegro_hand_dextreme import (
        AllegroHandDextremeADR,
    )

    spec = AllegroHandDextremeADR.OBS_SPEC
    assert sum(spec.values()) == 47
    assert list(spec) == [
        "dof_pos_randomized",
        "object_pose_cam_randomized",
        "goal_pose",
        "goal_relative_rot_cam_randomized",
        "last_actions",
    ]


def test_annealed_action_ema_and_latency_cap():
    """actionsMovingAverage dict anneals upper->lower over schedule_steps;
    ManualDR's latency cap ramps 0 -> actionLatencyMax (reference
    allegro_hand_dextreme.py:898-909, :1564-1576)."""
    env = make("AllegroHandDextremeManualDR", num_envs=2)
    assert env._ma_upper > env._ma_lower  # cfg dict parsed
    t0 = {"_frames": jnp.asarray(0, jnp.int32)}
    t_mid = {"_frames": jnp.asarray(int(env._ma_steps // 2), jnp.int32)}
    t_end = {"_frames": jnp.asarray(int(env._ma_steps * 2), jnp.int32)}
    a0 = float(env._act_ma(t0))
    am = float(env._act_ma(t_mid))
    ae = float(env._act_ma(t_end))
    assert a0 == pytest.approx(env._ma_upper)
    assert ae == pytest.approx(env._ma_lower)
    assert ae < am < a0
    # latency cap ramp
    c0 = int(env._latency_cap({"_frames": jnp.asarray(0, jnp.int32)}))
    cend = int(env._latency_cap(
        {"_frames": jnp.asarray(int(env._lat_sched * 2), jnp.int32)}
    ))
    assert c0 == 0
    assert cend == min(int(env._lat_max), 15)


def test_capped_dof_control_limits_target_rate():
    """use_capped_dof_control clamps the per-step PD-target delta at
    max_dof_radians_per_second * dt * control_freq_inv (reference
    apply_actions capped branch)."""
    env = make(
        "AllegroHandDextremeManualDR", num_envs=2,
        use_capped_dof_control=True, max_dof_radians_per_second=0.5,
    )
    assert env.use_capped_dof_control
    act_idx = np.asarray(env.actuated_idx)
    mid = 0.5 * (env.dof_lower + env.dof_upper)[jnp.asarray(act_idx)]
    prev = jnp.zeros(env.model.nv).at[jnp.asarray(act_idx)].set(mid)
    # full-scale action: without the cap the target would jump to the
    # joint limit; with it the move from a feasible target is <= max_d
    tgt = env._recompute_targets(
        {"targets": prev, "_frames": jnp.asarray(0)},
        jnp.ones(env.num_acts),
    )
    max_d = 0.5 * env.dt * env.control_freq_inv
    delta = np.abs(np.asarray(tgt - prev)[act_idx])
    assert (delta <= max_d + 1e-6).all()
    assert delta.max() > 0  # it does move toward the commanded target
