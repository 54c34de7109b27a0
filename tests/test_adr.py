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
