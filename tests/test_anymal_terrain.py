"""AnymalTerrain curriculum behavior: level promotion/demotion across
episode boundaries (reference update_terrain_level
anymal_terrain.py:427-435)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.config import load_config


def make(num_envs=8, episode_len=6):
    cfg = load_config(["task=AnymalTerrain", f"num_envs={num_envs}"])["task"]
    cfg["env"]["episodeLength"] = episode_len
    return task_map["AnymalTerrain"](cfg)


@pytest.mark.slow
def test_level_promotion_and_demotion_across_episodes():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    lvl0 = np.asarray(state.task["level"]).copy()

    # teleport every robot a full terrain-cell away from its spawn: the
    # walked-distance check must PROMOTE on episode end
    far = state.task["origin"][:, :2] + jnp.array([env.grid.env_length, 0.0])
    q = state.sim.q.at[:, 0:2].set(far)
    state = state.replace(sim=state.sim.replace(q=q))
    done_seen = np.zeros(8, bool)
    lvl_after = np.asarray(state.task["level"]).copy()
    for _ in range(env.max_episode_length + 1):
        state, obs, rew, done, ex = step(state, jnp.zeros((8, 12)))
        d = np.asarray(done)
        # the level is promoted/demoted AT the done step (then carried
        # through resample_init); capture each env's first episode end
        post = np.asarray(state.task["level"])
        lvl_after = np.where(d & ~done_seen, post, lvl_after)
        done_seen |= d
    assert done_seen.all()
    expect = np.clip(lvl0 + 1, 0, env.num_levels - 1)
    assert (lvl_after == expect).all(), (lvl0, lvl_after)

    # second episode: robots stand still -> walked distance ~0 -> DEMOTE
    state2, obs = env.reset(jax.random.PRNGKey(1))
    lvl0 = np.asarray(state2.task["level"]).copy()
    done_seen = np.zeros(8, bool)
    lvl_after = lvl0.copy()
    for _ in range(env.max_episode_length + 1):
        state2, obs, rew, done, ex = step(state2, jnp.zeros((8, 12)))
        d = np.asarray(done)
        post = np.asarray(state2.task["level"])
        lvl_after = np.where(d & ~done_seen, post, lvl_after)
        done_seen |= d
    assert done_seen.all()
    # standing still can't promote; any env with a nonzero command and a
    # level > 0 demotes (clipped at 0)
    assert (lvl_after <= lvl0).all(), (lvl0, lvl_after)
    # the curriculum stat is surfaced for logging
    assert "terrain_level" in ex


@pytest.mark.slow
def test_push_robots_overwrites_base_velocity():
    """Every pushInterval global steps the base xy velocity is replaced
    with a U[-1,1] draw (reference push_robots anymal_terrain.py:437-439)."""
    cfg = load_config(["task=AnymalTerrain", "num_envs=4"])["task"]
    cfg["env"]["learn"]["pushInterval_s"] = (
        3 * cfg["sim"]["dt"] * 4  # push every 3rd env step (decimation 4)
    )
    env = task_map["AnymalTerrain"](cfg)
    assert env.push_interval == 3
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((4, env.num_acts))
    seen_push = False
    for i in range(1, 8):
        prev_qd = np.asarray(state.sim.qd[:, 0:2])
        state, obs, rew, done, ex = step(state, a)
        cur = np.asarray(state.sim.qd[:, 0:2])
        if int(np.asarray(state.frames)) % 3 == 0:
            # pushed this step: base xy velocity is a fresh U[-1,1] draw,
            # uncorrelated with physics -- check it is inside [-1,1]
            assert (np.abs(cur) <= 1.0 + 1e-6).all()
            seen_push = True
    assert seen_push


def test_fused_merge_control_slices_matches_per_slice():
    """sim.fused_merge_control_slices folds the decimation loop into ONE
    fused kernel call (substeps x control_freq_inv internal slices).
    Against the per-slice fused path the only divergence is the wider
    entry-plane freeze window, so a short gentle rollout must stay
    close in state and identical in shape/finiteness."""
    import numpy as np

    def build(merge, terrain="trimesh"):
        cfg = load_config(["task=AnymalTerrain", "num_envs=4"])["task"]
        cfg["env"]["episodeLength"] = 50
        cfg["env"]["terrain"]["terrainType"] = terrain
        cfg.setdefault("sim", {})["use_fused"] = True
        cfg["sim"]["fused_merge_control_slices"] = merge
        return task_map["AnymalTerrain"](cfg)

    # With the warm-start resetting at the original call boundaries
    # (warm_reset_every), the merged window solves EXACTLY like
    # control_freq_inv separate calls on flat ground (no entry planes):
    # the flat comparison must track tightly. On rough terrain the one
    # remaining divergence is the entry-plane freeze window widening
    # from one slice to the whole env step -- bounded behaviorally.
    for terrain, tol_mean, tol_max in (
        ("plane", 1e-4, 1e-3),
        ("trimesh", 3e-2, 2.5e-1),
    ):
        e_m, e_s = build(True, terrain), build(False, terrain)
        assert e_m.fused_merge_slices and not e_s.fused_merge_slices
        s_m, o_m = e_m.reset(jax.random.PRNGKey(5))
        s_s, o_s = e_s.reset(jax.random.PRNGKey(5))
        np.testing.assert_allclose(
            np.asarray(o_m), np.asarray(o_s), atol=1e-6
        )
        step_m, step_s = jax.jit(e_m.step), jax.jit(e_s.step)
        acts = jnp.zeros((4, e_m.num_acts))
        for t in range(25):
            s_m, o_m, r_m, d_m, _ = step_m(s_m, acts)
            s_s, o_s, r_s, d_s, _ = step_s(s_s, acts)
        assert np.isfinite(np.asarray(o_m)).all()
        zq_m = np.asarray(s_m.sim.q)
        zq_s = np.asarray(s_s.sim.q)
        dq = np.abs(zq_m - zq_s)
        assert dq.mean() < tol_mean, (terrain, dq.mean())
        assert dq.max() < tol_max, (terrain, dq.max())
        # same mean base height (settled, not fallen/penetrated)
        assert abs(zq_m[:, 2].mean() - zq_s[:, 2].mean()) < 2e-2
