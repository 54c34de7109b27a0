"""ADR engine tests: boundary pinning, range evolution, entropy."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.dr.adr import ADR

CFG = {
    "use_adr": True,
    "update_adr_ranges": True,
    "worker_adr_boundary_fraction": 0.5,
    "adr_queue_threshold_length": 4,
    "adr_objective_threshold_low": 5,
    "adr_objective_threshold_high": 20,
    "params": {
        "mass_scale": {"init_range": [0.9, 1.1], "limits": [0.3, 3.0], "delta": 0.05},
        "friction": {"init_range": [0.8, 1.2], "limits": [0.1, 2.0], "delta": 0.1},
    },
}


def test_boundary_workers_pin_edges():
    adr = ADR(CFG, num_envs=256)
    st = adr.init_state(jax.random.PRNGKey(0))
    vals = np.asarray(adr.sample(st, jax.random.PRNGKey(1), 256))
    wb = np.asarray(st.worker_boundary)
    lo = np.asarray(st.lo)
    hi = np.asarray(st.hi)
    for i in range(256):
        if wb[i] >= 0:
            p, edge = wb[i] // 2, wb[i] % 2
            expected = hi[p] if edge else lo[p]
            assert abs(vals[i, p] - expected) < 1e-6
        else:
            assert ((vals[i] >= lo - 1e-6) & (vals[i] <= hi + 1e-6)).all()


def test_ranges_widen_on_good_performance():
    adr = ADR(CFG, num_envs=512)
    st = adr.init_state(jax.random.PRNGKey(0))
    hi0 = float(st.hi[0])
    nats0 = float(st.nats)
    key = jax.random.PRNGKey(2)
    update = jax.jit(adr.update)
    # every env finishes every step with objective above t_high
    done = jnp.ones(512, bool)
    obj = jnp.full(512, 50.0)
    for i in range(12):
        key, k = jax.random.split(key)
        st = update(st, k, done, obj)
    assert float(st.hi[0]) > hi0
    assert float(st.nats) > nats0  # entropy grows as ranges widen


def test_ranges_narrow_on_poor_performance():
    adr = ADR(CFG, num_envs=512)
    st = adr.init_state(jax.random.PRNGKey(0))
    width0 = float(st.hi[0] - st.lo[0])
    key = jax.random.PRNGKey(3)
    update = jax.jit(adr.update)
    done = jnp.ones(512, bool)
    obj = jnp.zeros(512)  # below t_low
    for i in range(12):
        key, k = jax.random.split(key)
        st = update(st, k, done, obj)
    assert float(st.hi[0] - st.lo[0]) < width0


# ---------------------------------------------------------------------------
# round-2 fidelity features: per-env queue pushes + range_path physics DR
# (reference adr_vec_task.py:543-610 range paths; :556 per-env extends)
# ---------------------------------------------------------------------------


def test_per_env_queue_pushes():
    """Every finishing boundary env pushes its own objective (not one
    mean per boundary per step)."""
    adr = ADR(CFG, num_envs=64)
    st = adr.init_state(jax.random.PRNGKey(0))
    # force 3 envs onto boundary 0 (queue length is 4, so no evaluation
    # triggers) and finish them in one step with distinct objectives
    wb = jnp.full(64, -1)
    wb = wb.at[jnp.arange(3)].set(0)
    st = st.replace(worker_boundary=wb, counts=jnp.zeros_like(st.counts))
    done = jnp.zeros(64, bool).at[jnp.arange(3)].set(True)
    objective = jnp.arange(64, dtype=jnp.float32)
    st2 = adr.update(st, jax.random.PRNGKey(1), done, objective)
    assert int(st2.counts[0]) == 3
    got = sorted(np.asarray(st2.queues[0, :3]).tolist())
    assert got == [0.0, 1.0, 2.0], got


def test_range_path_dr_overrides_and_pins():
    cfg = dict(CFG)
    cfg["params"] = dict(CFG["params"])
    cfg["params"]["obj_mass"] = {
        "range_path": "actor_params.object.rigid_body_properties.mass.range",
        "init_range": [0.7, 1.3],
        "limits": [0.1, 5.0],
        "delta": 0.05,
    }
    adr = ADR(cfg, num_envs=128)
    st = adr.init_state(jax.random.PRNGKey(0))
    ov = adr.dr_overrides(st)
    assert "object.rigid_body_properties.mass" in ov
    o = ov["object.rigid_body_properties.mass"]
    assert abs(float(o["lo"]) - 0.7) < 1e-6 and abs(float(o["hi"]) - 1.3) < 1e-6
    # pins: envs whose boundary is the obj_mass param pin lo or hi
    wb = np.asarray(st.worker_boundary)
    pi = adr.dr_params["object.rigid_body_properties.mass"]
    mask = np.asarray(o["pin_mask"])
    val = np.asarray(o["pin_val"])
    mine = (wb >= 0) & (wb // 2 == pi)
    assert (mask == mine).all()
    assert np.allclose(val[mine & (wb % 2 == 1)], 1.3)
    assert np.allclose(val[mine & (wb % 2 == 0)], 0.7)


def test_physics_param_flows_through_dr_engine():
    """An evolving ADR range reshapes the per-env physics draw: the DR
    engine samples object mass factors from the ADR range, boundary
    workers pinned at the edges (reference dict-DR path)."""
    import jax as _jax
    from isaacgymenvs_tpu.model.spec import FREE, ModelBuilder
    from isaacgymenvs_tpu.dr.randomize import DomainRandomizer

    b = ModelBuilder()
    b.add_body(parent=-1, name="obj", pos=(0, 0, 0), quat=(0, 0, 0, 1),
               jnt_type=FREE, mass=2.0, inertia=np.eye(3) * 1e-3)
    model = b.finalize()
    params = {
        "actor_params": {
            "object": {
                "rigid_body_properties": {
                    "mass": {
                        "range": [0.9, 1.1],
                        "operation": "scaling",
                        "distribution": "uniform",
                    }
                }
            }
        }
    }
    rnd = DomainRandomizer(model, params, actor_ranges={"object": (0, 1)})
    cfg = dict(CFG)
    cfg["params"] = {
        "obj_mass": {
            "range_path": "actor_params.object.rigid_body_properties.mass.range",
            "init_range": [0.7, 1.3],
            "limits": [0.1, 5.0],
            "delta": 0.05,
        }
    }
    adr = ADR(cfg, num_envs=512)
    st = adr.init_state(_jax.random.PRNGKey(0))
    # pretend the range evolved wider than the static DR schema
    st = st.replace(lo=jnp.asarray([0.3]), hi=jnp.asarray([2.5]))
    sample = rnd.sample(
        _jax.random.PRNGKey(1), 512, jnp.zeros(()), adr=adr.dr_overrides(st)
    )
    v = np.asarray(sample["object.rigid_body_properties.mass"])[:, 0]
    wb = np.asarray(st.worker_boundary)
    rollout = wb < 0
    # rollout draws span the EVOLVED range, not the static [0.9, 1.1]
    assert v[rollout].min() < 0.5 and v[rollout].max() > 2.0
    assert (v[rollout] >= 0.3 - 1e-5).all() and (v[rollout] <= 2.5 + 1e-5).all()
    # pinned boundary envs sit exactly at an edge
    pinned_hi = (wb >= 0) & (wb % 2 == 1)
    pinned_lo = (wb >= 0) & (wb % 2 == 0)
    if pinned_hi.any():
        assert np.allclose(v[pinned_hi], 2.5, atol=1e-5)
    if pinned_lo.any():
        assert np.allclose(v[pinned_lo], 0.3, atol=1e-5)
    # the batched model's object mass reflects the factors
    bm = rnd.batched_model(model, sample)
    assert np.allclose(np.asarray(bm.body_mass)[:, 0], 2.0 * v, rtol=1e-5)
