"""Domain-randomization tests (reference schema, SURVEY.md section 2.6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.dr import DomainRandomizer
from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.config import load_config

PARAMS = {
    "frequency": 5,
    "observations": {"range": [0, 0.002], "operation": "additive", "distribution": "gaussian"},
    "actions": {"range": [0.0, 0.02], "operation": "additive", "distribution": "gaussian"},
    "actor_params": {
        "ant": {
            "color": True,
            "rigid_body_properties": {
                "mass": {
                    "range": [0.5, 1.5],
                    "operation": "scaling",
                    "distribution": "uniform",
                    "setup_only": True,
                }
            },
            "dof_properties": {
                "damping": {"range": [0.5, 1.5], "operation": "scaling", "distribution": "uniform"},
                "lower": {"range": [0, 0.01], "operation": "additive", "distribution": "gaussian"},
            },
        }
    },
}


def _env(n=8):
    cfg = load_config(["task=Ant", f"num_envs={n}"])["task"]
    cfg["task"] = {"randomize": True, "randomization_params": PARAMS}
    return task_map["Ant"](cfg)


def test_sampling_ranges_and_ops():
    env = _env()
    dr = env.randomizer
    key = jax.random.PRNGKey(0)
    s = dr.sample(key, 64, jnp.zeros((), jnp.int32))
    mass = np.asarray(s["ant.rigid_body_properties.mass"])
    assert mass.shape == (64, env.model.nbody)
    assert (mass >= 0.5).all() and (mass <= 1.5).all()
    assert mass.std() > 0.1  # actually random
    # batched model applies scaling
    bm = dr.batched_model(env.model, s)
    np.testing.assert_allclose(
        np.asarray(bm.body_mass),
        np.asarray(env.model.body_mass)[None] * mass,
        rtol=1e-5,
    )


def test_per_env_physics_differs():
    env = _env(4)
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 8)))
    assert np.isfinite(np.asarray(obs)).all()
    # same initial state but different masses -> different trajectories is
    # implied; at minimum the sampled factors differ across envs
    damp = np.asarray(state.dr["ant.dof_properties.damping"])
    assert np.std(damp[:, 0]) > 0.0


def test_setup_only_persists_and_frequency_gates():
    env = _env(4)
    state, obs = env.reset(jax.random.PRNGKey(2))
    mass0 = np.asarray(state.dr["ant.rigid_body_properties.mass"]).copy()
    damp0 = np.asarray(state.dr["ant.dof_properties.damping"]).copy()
    step = jax.jit(env.step)
    # force env 0 done repeatedly past the frequency window
    for i in range(8):
        q = state.sim.q.at[0, 2].set(0.0)  # below termination height
        state = state.replace(sim=state.sim.replace(q=q))
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 8)))
    mass1 = np.asarray(state.dr["ant.rigid_body_properties.mass"])
    damp1 = np.asarray(state.dr["ant.dof_properties.damping"])
    np.testing.assert_allclose(mass1, mass0)  # setup_only never resampled
    assert abs(damp1[0, 0] - damp0[0, 0]) > 1e-9  # re-randomized on reset
    np.testing.assert_allclose(damp1[1], damp0[1])  # untouched env keeps its


def test_obs_action_noise_applied():
    env = _env(4)
    dr = env.randomizer
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((4, 10))
    y = dr.observation_noise(key, x, jnp.zeros((), jnp.int32))
    assert float(jnp.abs(y).max()) > 0.0
    assert float(jnp.abs(y).max()) < 0.02  # gaussian var 0.002


def test_correlated_noise_held_between_rerandomizations():
    """range_correlated: the correlated obs/action component is one
    per-env draw held fixed until the next DR re-randomization, on top
    of per-step white noise (reference docs/domain_randomization.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from isaacgymenvs_tpu.tasks import task_map

    cfg = {
        "env": {"numEnvs": 4, "clipActions": 1.0, "clipObservations": 100.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
        "task": {
            "randomize": True,
            "randomization_params": {
                "frequency": 10_000,  # never re-randomize in this test
                "observations": {
                    "range": [0, 1e-6],  # negligible white noise
                    "range_correlated": [0, 0.5],
                    "operation": "additive",
                    "distribution": "gaussian",
                },
            },
        },
    }
    env = task_map["Cartpole"](cfg)
    assert env.randomizer.obs_spec.corr_hi == 0.5
    state, obs = env.reset(jax.random.PRNGKey(0))
    corr = np.asarray(state.dr["observations_corr"])
    assert corr.shape == (4, env.num_obs)
    step = jax.jit(env.step)
    # hold the sim still (zero actions, nothing moves much in 2 steps):
    # the obs differences across steps must be tiny (white ~1e-6) while
    # the offset from the noiseless obs equals the correlated draw
    s1, o1, *_ = step(state, jnp.zeros((4, 1)))
    corr2 = np.asarray(s1.dr["observations_corr"])
    assert np.allclose(corr, corr2)  # held fixed between resets


def test_actor_scale_randomization():
    """actor_params.<actor>.scale: uniform geometric scaling per env --
    points and geom sizes x s, mass x s^3, inertia x s^5 (the reference
    set_actor_scale + mass rescale semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from isaacgymenvs_tpu.dr.randomize import DomainRandomizer
    from isaacgymenvs_tpu.model.spec import FREE, GEOM_BOX, ModelBuilder

    b = ModelBuilder()
    body = b.add_body(parent=-1, name="obj", pos=(0, 0, 0), quat=(0, 0, 0, 1),
                      jnt_type=FREE, mass=2.0, inertia=np.eye(3) * 1e-3)
    b.add_geom(body, GEOM_BOX, (0, 0, 0), (0, 0, 0, 1), (0.1, 0.1, 0.1), 0.5)
    model = b.finalize()
    params = {"actor_params": {"object": {
        "scale": {"range": [0.5, 0.5], "operation": "scaling",
                  "distribution": "uniform", "setup_only": True}}}}
    rnd = DomainRandomizer(model, params, actor_ranges={"object": (0, 1)})
    sample = rnd.sample(jax.random.PRNGKey(0), 3, jnp.zeros(()))
    assert np.allclose(np.asarray(sample["object.scale"]), 0.5)
    bm = rnd.batched_model(model, sample)
    assert np.allclose(np.asarray(bm.geom_size)[:, 0], 0.05)
    assert np.allclose(np.asarray(bm.body_mass)[:, 0], 2.0 * 0.5**3)
    assert np.allclose(
        np.asarray(bm.body_inertia)[:, 0, 0, 0], 1e-3 * 0.5**5
    )
    # identity sample leaves everything unscaled
    ident = rnd.identity_sample(3)
    bm2 = rnd.batched_model(model, ident)
    assert np.allclose(np.asarray(bm2.geom_size)[:, 0], 0.1)


@pytest.mark.slow
def test_per_key_observation_noise():
    """Reference dict-DR: per-obs-key noise dicts noise ONLY their slice
    of the flat obs vector (AllegroHandLSTM.yaml observations.dof_pos/
    object_pose_cam/... via the task's obs_spec() view)."""
    cfg = load_config(["task=AllegroHandLSTM", "num_envs=4"])["task"]
    # noise two keys only; the rest must come through untouched
    cfg["task"]["randomization_params"]["observations"] = {
        "dof_pos": {"range": [0, 0.01], "operation": "additive",
                    "distribution": "gaussian"},
        "goal_pose": {"range": [0, 0.01], "operation": "additive",
                      "distribution": "gaussian"},
    }
    env = task_map["AllegroHand"](cfg)
    rz = env.randomizer
    assert set(rz.obs_key_specs) == {"dof_pos", "goal_pose"}
    obs = jnp.zeros((4, env.num_obs))
    out = rz.observation_noise(jax.random.PRNGKey(0), obs, 0)
    sl = env.obs_spec()
    o = np.asarray(out)
    for k in ("dof_pos", "goal_pose"):
        off, size = sl[k]
        assert np.abs(o[:, off : off + size]).max() > 0, k
    for k in ("object_pose_cam", "goal_relative_rot_cam", "last_actions"):
        off, size = sl[k]
        assert np.abs(o[:, off : off + size]).max() == 0, k


def test_external_param_generator():
    """Reference actor_params_generator hook (vec_task.py:734-744):
    an external joint distribution replaces the independent per-param
    draws; get_actor_params_info gives the flat layout."""
    from isaacgymenvs_tpu.dr import FullCovarianceParamGenerator

    env = _env(4)
    info = env.get_actor_params_info()
    names = [i["name"] for i in info]
    assert names == [s.name for s in env.randomizer.model_specs]
    P = env.randomizer.num_extern_params()
    assert P == sum(i["size"] for i in info)
    # deterministic generator (zero covariance): every sampled factor is
    # exactly the mean -> the batched model is exactly base * mean
    mean = np.full(P, 1.25, np.float32)
    # the additive dof lower-limit spec must get offset 0, not factor 1.25
    off = 0
    for i in info:
        if i["operation"] == "additive":
            mean[off : off + i["size"]] = 0.0
        off += i["size"]
    gen = FullCovarianceParamGenerator(mean, cov=np.zeros((P, P)))
    env.set_param_generator(gen)
    s = env.randomizer.sample(jax.random.PRNGKey(0), 4,
                              jnp.zeros((), jnp.int32))
    mass = np.asarray(s["ant.rigid_body_properties.mass"])
    np.testing.assert_allclose(mass, 1.25, rtol=1e-6)
    bm = env.randomizer.batched_model(env.model, s)
    np.testing.assert_allclose(
        np.asarray(bm.body_mass),
        np.broadcast_to(np.asarray(env.model.body_mass) * 1.25, (4, 9)),
        rtol=1e-5,
    )
    # full-covariance draws actually correlate params: cov with perfect
    # correlation between the first two entries
    cov = np.eye(P, dtype=np.float32) * 1e-4
    cov[0, 1] = cov[1, 0] = 1e-4
    gen2 = FullCovarianceParamGenerator(np.ones(P), cov=cov)
    draws = np.asarray(gen2(jax.random.PRNGKey(1), 512))
    c = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
    assert c > 0.95
    # end-to-end: the jitted reset path consumes the generator
    state, obs = env.reset(jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(state.dr["ant.rigid_body_properties.mass"]), 1.25,
        rtol=1e-6,
    )
    assert np.isfinite(np.asarray(obs)).all()
