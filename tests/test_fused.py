"""Fused whole-step kernel (engine/fused.py) vs the vmap engine.

The fused path re-expresses physics_step as one Pallas kernel; on CPU the
same math runs as plain jnp (use_pallas=False), so these tests pin the
MATH equivalence: the Pallas lowering itself is exercised on TPU by
bench.py and the env smoke runs there.

Reference mapping: the kernel replaces the PhysX step the reference
drives via gym.simulate (isaacgymenvs/tasks/base/vec_task.py:382).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.engine import fused
from isaacgymenvs_tpu.engine import step as estep
from isaacgymenvs_tpu.engine.dynamics import SimState
from isaacgymenvs_tpu.tasks import task_map


def _env(name, n=4):
    cfg = {
        "env": {"numEnvs": n, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    return task_map[name](cfg)


def _compare(env, steps=3, with_xfrc=False, with_qt=False, tol=2e-4,
             qfrc_scale=3.0):
    model, params = env.model, env.sim_params
    n = env.num_envs
    state, _ = env.reset(jax.random.PRNGKey(0))
    q, qd = state.sim.q, state.sim.qd
    rng = np.random.RandomState(1)
    qfrc = jnp.asarray(
        rng.uniform(-1, 1, (n, model.nv)).astype(np.float32)
    ) * qfrc_scale
    xfrc = (
        jnp.asarray(rng.uniform(-1, 1, (n, model.nbody, 6)).astype(np.float32))
        if with_xfrc
        else None
    )
    qt = (
        jnp.asarray(np.tile(np.asarray(model.qpos0), (n, 1)).astype(np.float32))
        if with_qt
        else None
    )

    def one(q1, qd1, f1):
        out = estep.physics_step(
            model, SimState(q=q1, qd=qd1), f1, params,
            xfrc=None if xfrc is None else xfrc[0] * 0 + xfrc[0],
            q_target=None if qt is None else qt[0],
        )
        return out.state.q, out.state.qd, out.body_force, out.dof_force

    def one_i(q1, qd1, f1, i):
        out = estep.physics_step(
            model, SimState(q=q1, qd=qd1), f1, params,
            xfrc=None if xfrc is None else xfrc[i],
            q_target=None if qt is None else qt[i],
        )
        return out.state.q, out.state.qd, out.body_force, out.dof_force

    vm = jax.jit(
        jax.vmap(one_i, in_axes=(0, 0, 0, 0))
    )
    fu = jax.jit(
        lambda q, qd, f: fused.physics_step_fused(
            model, params, q, qd, f, xfrc=xfrc, q_target=qt, use_pallas=False
        )
    )
    idx = jnp.arange(n)
    for _ in range(steps):
        q1, qd1, bf1, df1 = vm(q, qd, qfrc, idx)
        out = fu(q, qd, qfrc)
        assert float(jnp.max(jnp.abs(q1 - out.q))) < tol
        assert float(jnp.max(jnp.abs(qd1 - out.qd))) < 10 * tol
        assert float(jnp.max(jnp.abs(bf1 - out.body_force))) < 100 * tol
        assert float(jnp.max(jnp.abs(df1 - out.dof_force))) < 100 * tol
        q, qd = q1, qd1


def test_fused_matches_vmap_ant():
    _compare(_env("Ant"))


def test_fused_matches_vmap_ant_xfrc():
    _compare(_env("Ant"), with_xfrc=True)


def test_fused_matches_vmap_cartpole():
    # fixed-base, no contact points: exercises the nc == 0 branch
    _compare(_env("Cartpole"))


def test_fused_matches_vmap_humanoid():
    _compare(_env("Humanoid"), steps=2)


def test_fused_supported_gating():
    ant = _env("Ant")
    assert fused.fused_supported(ant.model, ant.sim_params, None)
    # BallBalance: bilateral anchors + a sphere-vs-cylinder point pair,
    # both covered by the fused kernel since round 3
    bb = _env("BallBalance")
    assert fused.fused_supported(bb.model, bb.sim_params, None)


def test_fused_matches_vmap_ball_balance():
    """Bilateral anchor rows (unprojected, erp_att-driven) + the
    point-vs-CYLINDER narrowphase through the fused math vs the vmap
    engine (contacts.py sources 2b and 3)."""
    env = _env("BallBalance")
    _compare(env, steps=3, tol=5e-4, qfrc_scale=0.5)


def test_fused_env_step_equivalence():
    """Whole env.step with use_fused=True matches the vmap-path env.step."""
    cfg = {
        "env": {"numEnvs": 4, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env_v = task_map["Ant"](dict(cfg))
    cfg_f = {**cfg, "sim": {**cfg["sim"], "use_fused": True}}
    env_f = task_map["Ant"](cfg_f)
    s_v, o_v = env_v.reset(jax.random.PRNGKey(0))
    s_f, o_f = env_f.reset(jax.random.PRNGKey(0))
    assert jnp.allclose(o_v, o_f)
    acts = jax.random.uniform(
        jax.random.PRNGKey(2), (4, env_v.num_acts), minval=-1, maxval=1
    )
    step_v = jax.jit(env_v.step)
    step_f = jax.jit(env_f.step)
    for _ in range(3):
        s_v, o_v, r_v, d_v, _ = step_v(s_v, acts)
        s_f, o_f, r_f, d_f, _ = step_f(s_f, acts)
        assert float(jnp.max(jnp.abs(o_v - o_f))) < 1e-3
        assert float(jnp.max(jnp.abs(r_v - r_f))) < 1e-3
        assert bool(jnp.all(d_v == d_f))


def test_fused_matches_vmap_franka_cube_stack_ppair():
    """Point-vs-box pair contacts (hand-object style) in the fused math:
    FrankaCubeStack's finger/cube/cubeB rows vs the vmap engine.

    Inputs are gentle (gravity + the PD spring, mild torques): under
    violent random torques the stiff-contact system's own conditioning
    amplifies 1e-6 input noise to ~0.25 in qd (measured on the vmap
    engine against itself), so chaotic-regime trajectories cannot pin
    math equivalence."""
    _compare(_env("FrankaCubeStack"), steps=2, qfrc_scale=0.05, tol=5e-4)


def test_fused_matches_vmap_shadow_hand_ppair():
    """ShadowHand: 78 point-vs-box rows + tendons + Coulomb dof friction
    through the fused math."""
    env = task_map["ShadowHand"](
        {
            "env": {
                "numEnvs": 4,
                "clipActions": 1.0,
                "observationType": "full_state",
            },
            "sim": {"dt": 1 / 60, "substeps": 2},
        }
    )
    _compare(env, steps=2, tol=5e-4, qfrc_scale=0.05)


def test_fused_supported_ppair_gating():
    sh = task_map["ShadowHand"](
        {
            "env": {"numEnvs": 2, "observationType": "full_state"},
            "sim": {"dt": 1 / 60, "substeps": 2},
        }
    )
    # uncapped, the full 78-candidate Delassus system exceeds the VMEM
    # budget; with the yaml's max_active_contacts=24 the top-K fused
    # path shrinks it to (3*24)^2 and the model runs fused
    assert not fused.fused_supported(sh.model, sh.sim_params, None)
    capped = sh.sim_params.replace(max_active_contacts=24)
    assert fused.fused_supported(sh.model, capped, None)
    # mesh-geom pairs (FrankaCabinet) ride the cylinder fall-through
    # since round 4 (test_fused_matches_vmap_franka_cabinet_mesh_ppair)
    fc = _env("FrankaCabinet")
    assert fused.fused_supported(fc.model, fc.sim_params, None)


def test_fused_matches_vmap_shadow_hand_capped():
    """ShadowHand at its yaml operating point (max_active_contacts=24 <
    78 candidates): the fused top-K selection must reproduce the vmap
    engine's lax.top_k active set (predicted-depth key, index ties)."""
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(["task=ShadowHand", "num_envs=4"])["task"]
    env = task_map["ShadowHand"](cfg)
    assert env.sim_params.max_active_contacts == 24
    assert fused.fused_supported(env.model, env.sim_params, env.terrain)
    _compare(env, steps=3, tol=5e-4, qfrc_scale=0.05)


def test_fused_matches_vmap_allegro_kuka():
    """AllegroKuka (cube corners vs table box + fingertips vs cube, all
    point-vs-box pairs on an uncapped row set) through the fused math."""
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(["task=AllegroKukaReorientation", "num_envs=4"])["task"]
    env = task_map["AllegroKukaReorientation"](cfg)
    assert fused.fused_supported(env.model, env.sim_params, env.terrain)
    _compare(env, steps=2, qfrc_scale=0.05, tol=5e-4)


def _yaml_env(name, n=4):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config([f"task={name}", f"num_envs={n}", "headless=True"])
    return task_map[name](cfg["task"])


def test_fused_matches_vmap_trifinger():
    # real yaml operating point (fingertip-vs-cube pair contacts, uncapped
    # rows): the third distinct topology after Ant/Humanoid
    env = _yaml_env("Trifinger")
    assert fused.fused_supported(env.model, env.sim_params, env.terrain)
    # moderate torques + AllegroKuka-class tolerance: under extreme random
    # torques the APGD iterate (identical algorithm, different op order)
    # has not converged and the two paths round differently
    _compare(env, steps=2, qfrc_scale=0.05, tol=5e-4)


def test_yaml_configs_fused_eligible():
    """The shipped task yamls for the fused-covered flagships must stay
    eligible for the whole-step kernel -- a regressed cap or feature flag
    here silently drops TPU training back to the vmap path."""
    for name in ["Ant", "Humanoid", "Trifinger"]:
        env = _yaml_env(name)
        assert fused.fused_supported(
            env.model, env.sim_params, env.terrain
        ), name


def test_fused_restitution_matches_vmap():
    """Newton restitution through the fused math: a bouncing sphere
    (e=0.8) tracks the vmap engine step-for-step (contacts.solve_contacts
    bounce_threshold_velocity semantics, previously a fused gate)."""
    from isaacgymenvs_tpu.engine import SimParams, SimState, physics_step
    from isaacgymenvs_tpu.model.spec import FREE, GEOM_SPHERE, ModelBuilder
    from isaacgymenvs_tpu.sdf.builder import add_contact_points

    b = ModelBuilder()
    body = b.add_body(
        parent=-1, name="ball", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=1.0, inertia=np.eye(3) * 1e-3,
    )
    b.qpos0_free[body] = (
        np.array([0, 0, 1.0], np.float32), np.array([0, 0, 0, 1], np.float32)
    )
    b.add_geom(body, GEOM_SPHERE, (0, 0, 0), (0, 0, 0, 1), (0.1, 0, 0), 0.5)
    m = b.finalize()
    m, idx = add_contact_points(
        m, body, np.array([[0.0, 0.0, -0.1]], np.float32), friction=0.5
    )
    m = m.replace(cpoint_restitution=jnp.zeros(m.ncp).at[idx[0]].set(0.8))
    params = SimParams(dt=1 / 120, substeps=2, baumgarte_erp=0.1)
    assert fused.fused_supported(m, params, None)

    n = 4
    q = jnp.tile(m.qpos0, (n, 1))
    qd = jnp.zeros((n, m.nv)).at[:, 2].set(-3.0)
    zero = jnp.zeros((n, m.nv))
    vm = jax.jit(jax.vmap(
        lambda q1, qd1: (lambda o: (o.state.q, o.state.qd))(
            physics_step(m, SimState(q=q1, qd=qd1), jnp.zeros(m.nv), params)
        )
    ))
    fu = jax.jit(lambda q, qd: fused.physics_step_fused(
        m, params, q, qd, zero, use_pallas=False
    ))
    bounced = False
    for _ in range(30):
        q1, qd1 = vm(q, qd)
        out = fu(q, qd)
        assert float(jnp.max(jnp.abs(q1 - out.q))) < 2e-5
        assert float(jnp.max(jnp.abs(qd1 - out.qd))) < 2e-4
        q, qd = q1, qd1
        bounced = bounced or float(qd[0, 2]) > 1.8
    assert bounced  # the rebound actually happened through the fused path


def test_fused_dyn_leaves_match_vmap():
    """Per-env DR leaves as fused-kernel inputs (DYN_LEAVES + gravity)
    vs the vmap engine with the same batched Model/params leaves."""
    env = _env("Ant")
    m, params = env.model, env.sim_params
    n = 4
    rng = np.random.RandomState(0)
    dyn = {
        "dof_damping": jnp.asarray(
            np.asarray(m.dof_damping)[None]
            * rng.uniform(0.5, 2.0, (n, m.nv)), jnp.float32),
        "dof_stiffness": jnp.asarray(
            np.asarray(m.dof_stiffness)[None]
            * rng.uniform(0.8, 1.2, (n, m.nv)), jnp.float32),
        "armature": jnp.asarray(
            np.asarray(m.armature)[None]
            * rng.uniform(0.8, 1.2, (n, m.nv)), jnp.float32),
        "body_mass": jnp.asarray(
            np.asarray(m.body_mass)[None]
            * rng.uniform(0.8, 1.2, (n, m.nbody)), jnp.float32),
        "cpoint_friction": jnp.asarray(
            np.asarray(m.cpoint_friction)[None]
            * rng.uniform(0.7, 1.3, (n, m.ncp)), jnp.float32),
        "gravity": jnp.asarray(
            np.asarray(params.gravity)[None]
            * rng.uniform(0.9, 1.1, (n, 3)), jnp.float32),
    }
    state, _ = env.reset(jax.random.PRNGKey(0))
    q, qd = state.sim.q, state.sim.qd
    qfrc = jnp.asarray(rng.uniform(-1, 1, (n, m.nv)).astype(np.float32)) * 2.0

    def one(q1, qd1, f1, dd, ds, ar, bm, cf, gv):
        mb = m.replace(dof_damping=dd, dof_stiffness=ds, armature=ar,
                       body_mass=bm, cpoint_friction=cf)
        pb = params.replace(gravity=gv)
        out = estep.physics_step(mb, SimState(q=q1, qd=qd1), f1, pb)
        return out.state.q, out.state.qd, out.body_force

    vm = jax.jit(jax.vmap(one))
    fu = jax.jit(lambda q, qd, f: fused.physics_step_fused(
        m, params, q, qd, f, use_pallas=False, dyn=dyn))
    for _ in range(3):
        q1, qd1, bf1 = vm(q, qd, qfrc, dyn["dof_damping"],
                          dyn["dof_stiffness"], dyn["armature"],
                          dyn["body_mass"], dyn["cpoint_friction"],
                          dyn["gravity"])
        out = fu(q, qd, qfrc)
        assert float(jnp.max(jnp.abs(q1 - out.q))) < 2e-5
        assert float(jnp.max(jnp.abs(qd1 - out.qd))) < 2e-4
        assert float(jnp.max(jnp.abs(bf1 - out.body_force))) < 2e-2
        q, qd = q1, qd1


def test_fused_dr_env_dispatch():
    """A DR'd env whose batched leaves all fall in DYN_LEAVES dispatches
    to the fused kernel (sim.use_fused=True) and matches the vmap path
    env-for-env (AllegroHandDextremeADR: 7 batched leaves incl. the
    physics-inert dof_max_effort)."""
    from isaacgymenvs_tpu.utils.config import load_config

    def mk(use_fused):
        cfg = load_config(["task=AllegroHandDextremeADR", "num_envs=4"])[
            "task"]
        if use_fused:
            cfg.setdefault("sim", {})["use_fused"] = True
        return task_map["AllegroHandDextremeADR"](cfg)

    env_v, env_f = mk(False), mk(True)
    assert env_f._fused_capable
    s_v, o_v = env_v.reset(jax.random.PRNGKey(0))
    s_f, o_f = env_f.reset(jax.random.PRNGKey(0))
    step_v, step_f = jax.jit(env_v.step), jax.jit(env_f.step)
    acts = jax.random.uniform(
        jax.random.PRNGKey(5), (4, env_v.num_acts), minval=-1, maxval=1)
    for _ in range(3):
        s_v, o_v, r_v, d_v, _ = step_v(s_v, acts)
        s_f, o_f, r_f, d_f, _ = step_f(s_f, acts)
        assert float(jnp.max(jnp.abs(o_v - o_f))) < 1e-3
        assert bool(jnp.all(d_v == d_f))
    # the fused cache really holds a dyn-leaf entry for this model
    assert any(len(k[5]) >= 7 for k in fused._CACHE if len(k) > 5)


# ---------------------------------------------------------------------------
# heightfield terrain via entry-sampled planes (fused.terrain_dyn)
# ---------------------------------------------------------------------------


def _terrain_compare(terr, steps, q_tol, qd_tol):
    from isaacgymenvs_tpu.engine.dynamics import Terrain  # noqa: F401

    env = _env("Ant")
    model, params = env.model, env.sim_params
    state, _ = env.reset(jax.random.PRNGKey(0))
    q, qd = state.sim.q, state.sim.qd
    rng = np.random.RandomState(1)
    qfrc = jnp.asarray(
        rng.uniform(-1, 1, (4, model.nv)).astype(np.float32)) * 3.0

    def one(q1, qd1, f1):
        out = estep.physics_step(
            model, SimState(q=q1, qd=qd1), f1, params, terrain=terr)
        return out.state.q, out.state.qd

    vm = jax.jit(jax.vmap(one))

    def fu_fn(q, qd, f):
        dyn = fused.terrain_dyn(model, terr, q, qd)
        return fused.physics_step_fused(
            model, params, q, qd, f, use_pallas=False, dyn=dyn)

    fu = jax.jit(fu_fn)
    for _ in range(steps):
        q1, qd1 = vm(q, qd, qfrc)
        out = fu(q, qd, qfrc)
        assert float(jnp.max(jnp.abs(q1 - out.q))) < q_tol
        assert float(jnp.max(jnp.abs(qd1 - out.qd))) < qd_tol
        q, qd = q1, qd1


def test_fused_terrain_flat_matches_vmap():
    """On a constant-height field the entry-sampled plane EQUALS the
    vmap engine's per-slice resample, so the fused path must agree to fp
    tolerance (pins the _terr_* row wiring end to end)."""
    from isaacgymenvs_tpu.engine.dynamics import Terrain

    H = jnp.full((64, 64), 0.05)
    terr = Terrain(
        height=H, horizontal_scale=0.5, origin=jnp.array([-16.0, -16.0]))
    assert fused.fused_supported(
        _env("Ant").model, _env("Ant").sim_params, terr)
    _terrain_compare(terr, steps=3, q_tol=2e-5, qd_tol=2e-4)


def test_fused_terrain_slope_close():
    """Sloped field: within-step xy drift makes the entry-sampled height
    an approximation (documented divergence in terrain_dyn); the
    trajectories must stay mm-close over several steps."""
    from isaacgymenvs_tpu.engine.dynamics import Terrain

    xs = np.arange(64) * 0.5 - 16.0
    H = jnp.asarray(
        np.broadcast_to(0.15 * xs[:, None], (64, 64)).astype(np.float32))
    terr = Terrain(
        height=H, horizontal_scale=0.5, origin=jnp.array([-16.0, -16.0]))
    _terrain_compare(terr, steps=5, q_tol=2e-3, qd_tol=2e-1)


@pytest.mark.slow
def test_fused_env_anymal_terrain_dispatch():
    """AnymalTerrain (curriculum heightfield, top-K cap 20) dispatches to
    the fused path under sim.use_fused=True and tracks the vmap engine:
    identical resets, same rewards over the first steps."""

    def mk(use_fused):
        cfg = {"env": {"numEnvs": 4}, "sim": {"use_fused": use_fused}}
        return task_map["AnymalTerrain"](cfg)

    e_v, e_f = mk(False), mk(True)
    assert e_f._fused_capable
    s_v, o_v = e_v.reset(jax.random.PRNGKey(0))
    s_f, o_f = e_f.reset(jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(o_v - o_f))) == 0.0
    act = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (4, e_v.num_acts)).astype(np.float32))
    step_v, step_f = jax.jit(e_v.step), jax.jit(e_f.step)
    for _ in range(3):
        s_v, o_v, r_v, d_v, _ = step_v(s_v, act)
        s_f, o_f, r_f, d_f, _ = step_f(s_f, act)
        assert float(jnp.max(jnp.abs(r_v - r_f))) < 1e-3
        assert float(jnp.max(jnp.abs(o_v - o_f))) < 0.5
        assert bool(jnp.all(d_v == d_f))


def test_fused_scale_dr_trifinger_dispatch():
    """Actor-scale + inertia DR leaves (body_ipos/body_inertia/
    cpoint_pos/geom_size) run through the fused kernel: Trifinger's DR
    stack batches all four, so it dispatches fused under
    sim.use_fused=True and matches the vmap engine env-for-env."""
    from isaacgymenvs_tpu.utils.config import load_config

    def mk(use_fused):
        cfg = load_config(["task=Trifinger", "num_envs=4"])["task"]
        if use_fused:
            cfg.setdefault("sim", {})["use_fused"] = True
        return task_map["Trifinger"](cfg)

    env_v, env_f = mk(False), mk(True)
    assert env_f._fused_capable
    assert env_f.randomizer is not None
    batched = env_f.randomizer.batched_leaf_names()
    assert {"body_ipos", "body_inertia", "cpoint_pos", "geom_size"} <= batched
    assert batched <= set(fused.DYN_LEAVES) | set(fused.DYN_INERT)
    s_v, o_v = env_v.reset(jax.random.PRNGKey(0))
    s_f, o_f = env_f.reset(jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(o_v - o_f))) == 0.0
    acts = jax.random.uniform(
        jax.random.PRNGKey(5), (4, env_v.num_acts), minval=-1, maxval=1)
    step_v, step_f = jax.jit(env_v.step), jax.jit(env_f.step)
    for _ in range(3):
        s_v, o_v, r_v, d_v, _ = step_v(s_v, acts)
        s_f, o_f, r_f, d_f, _ = step_f(s_f, acts)
        assert float(jnp.max(jnp.abs(o_v - o_f))) < 1e-4
        assert bool(jnp.all(d_v == d_f))


def test_fused_matches_vmap_franka_cabinet_mesh_ppair():
    """FrankaCabinet's drawer-handle MESH ppair geom takes the same
    cylinder fall-through in the fused kernel as the vmap narrowphase's
    else branch: the task dispatches fused and matches env-for-env."""
    from isaacgymenvs_tpu.utils.config import load_config

    def mk(use_fused):
        cfg = load_config(["task=FrankaCabinet", "num_envs=4"])["task"]
        if use_fused:
            cfg.setdefault("sim", {})["use_fused"] = True
        return task_map["FrankaCabinet"](cfg)

    e_v, e_f = mk(False), mk(True)
    assert e_f._fused_capable
    s_v, o_v = e_v.reset(jax.random.PRNGKey(0))
    s_f, o_f = e_f.reset(jax.random.PRNGKey(0))
    acts = jax.random.uniform(
        jax.random.PRNGKey(5), (4, e_v.num_acts), minval=-1, maxval=1)
    step_v, step_f = jax.jit(e_v.step), jax.jit(e_f.step)
    for _ in range(3):
        s_v, o_v, r_v, d_v, _ = step_v(s_v, acts)
        s_f, o_f, r_f, d_f, _ = step_f(s_f, acts)
        assert float(jnp.max(jnp.abs(o_v - o_f))) < 1e-3
        assert bool(jnp.all(d_v == d_f))


# ---------------------------------------------------------------------------
# SDF pair rows via entry-sampled contact planes (fused.sdf_dyn)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_fused_sdf_nut_rests_on_threads():
    """The fused kernel's entry-sampled SDF planes preserve thread
    engagement: a free nut dropped onto the bolt catches on the threads
    (not the shank), settles, and lands within ~2 mm of the vmap
    engine's resting height (first-order-field divergence bound)."""
    from isaacgymenvs_tpu.engine import SimParams, SimState, physics_step
    from isaacgymenvs_tpu.model.compose import compose
    from isaacgymenvs_tpu.sdf.builder import (
        add_contact_points, attach_sdf, pair_points_with_sdf)
    from isaacgymenvs_tpu.tasks.factory_nut_bolt import (
        BOLT_TOP, _strip_points, bolt_sdf_grid, build_bolt, build_nut,
        nut_contact_points)

    model, refs = compose([build_nut(), build_bolt()], ["nut:", "bolt:"])
    nut_body = refs[0].body0
    bolt_body = refs[1].body0 + 1
    model = _strip_points(model, set(range(model.nbody)))
    rims, thread = nut_contact_points()
    model, rim_idx = add_contact_points(model, nut_body, rims, friction=0.25)
    model, thr_idx = add_contact_points(model, nut_body, thread, friction=0.18)
    model, g = attach_sdf(model, bolt_body, bolt_sdf_grid())
    model = pair_points_with_sdf(model, rim_idx + thr_idx, g)
    params = SimParams(
        dt=1 / 60, substeps=2, gravity=jnp.array([0.0, 0.0, -9.81]),
        solver="apgd", solver_apgd_iterations=64)
    nq = model.q_adr[nut_body]
    yaw0 = np.radians(30.0)
    q0 = model.qpos0
    q0 = q0.at[nq:nq + 3].set(jnp.array([0.0, 0.0, BOLT_TOP - 0.004]))
    q0 = q0.at[nq + 3:nq + 7].set(
        jnp.array([0.0, 0.0, np.sin(yaw0 / 2), np.cos(yaw0 / 2)]))

    @jax.jit
    def roll_v(q, qd):
        def body(s, _):
            out = estep.physics_step(
                model, SimState(q=s[0], qd=s[1]),
                jnp.zeros(model.nv), params)
            return (out.state.q, out.state.qd), out.state.q[nq + 2]
        return jax.lax.scan(body, (q, qd), None, length=180)

    @jax.jit
    def roll_f(q, qd):
        def body(s, _):
            dyn = fused.sdf_dyn(model, s[0], s[1])
            out = fused.physics_step_fused(
                model, params, s[0], s[1], jnp.zeros((1, model.nv)),
                use_pallas=False, dyn=dyn)
            return (out.q, out.qd), out.q[0, nq + 2]
        return jax.lax.scan(body, (q, qd), None, length=180)

    _, zs_v = roll_v(q0, jnp.zeros(model.nv))
    _, zs_f = roll_f(q0[None], jnp.zeros((1, model.nv)))
    zs_v, zs_f = np.asarray(zs_v), np.asarray(zs_f)
    assert np.isfinite(zs_f).all()
    assert zs_f[-1] > 0.030  # caught the threads, not the bolt head
    assert abs(zs_f[-1] - zs_f[120]) < 5e-4  # settled
    assert abs(zs_f[-1] - zs_v[-1]) < 2.5e-3  # near the vmap resting z


@pytest.mark.slow
def test_fused_sdf_env_dispatch_and_reward_level():
    """Factory/IndustReal env dispatch on the fused path: NutBoltPick
    tracks the vmap engine pointwise under zero actions; PegsInsert's
    0.1 mm-clearance contact amplifies the entry-sampling divergence,
    so the gate there is distribution-level: finite state, zero
    interpenetration, mean reward within 10%."""
    from isaacgymenvs_tpu.utils.config import load_config

    def mk(name, use_fused):
        cfg = load_config([f"task={name}", "num_envs=4"])["task"]
        if use_fused:
            cfg.setdefault("sim", {})["use_fused"] = True
        return task_map[name](cfg)

    e_v, e_f = mk("FactoryTaskNutBoltPick", False), mk(
        "FactoryTaskNutBoltPick", True)
    assert e_f._fused_capable
    s_v, o_v = e_v.reset(jax.random.PRNGKey(0))
    s_f, o_f = e_f.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((4, e_v.num_acts))
    step_v, step_f = jax.jit(e_v.step), jax.jit(e_f.step)
    for _ in range(4):
        s_v, o_v, r_v, d_v, _ = step_v(s_v, acts)
        s_f, o_f, r_f, d_f, _ = step_f(s_f, acts)
        assert float(jnp.max(jnp.abs(o_v - o_f))) < 1e-4

    e_v, e_f = mk("IndustRealTaskPegsInsert", False), mk(
        "IndustRealTaskPegsInsert", True)
    assert e_f._fused_capable
    s_v, _ = e_v.reset(jax.random.PRNGKey(0))
    s_f, _ = e_f.reset(jax.random.PRNGKey(0))
    step_v, step_f = jax.jit(e_v.step), jax.jit(e_f.step)
    key = jax.random.PRNGKey(7)
    rv = rf = 0.0
    for _ in range(30):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, e_v.num_acts), minval=-0.3, maxval=0.3)
        s_v, _, r_v, _, _ = step_v(s_v, a)
        s_f, _, r_f, _, _ = step_f(s_f, a)
        rv += float(r_v.mean())
        rf += float(r_f.mean())
    assert bool(jnp.isfinite(s_f.sim.q).all())
    assert abs(rv - rf) < 0.1 * abs(rv)
