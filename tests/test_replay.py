"""Replay visualizer tests: render() stub, frame recording, PNG output
(reference vec_task.py:457-512 viewer + frame capture equivalent)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.replay import FrameRecorder, render_replay


def test_record_and_render_cartpole(tmp_path):
    env = task_map["Cartpole"]({"env": {"numEnvs": 2}})
    state, obs = env.reset(jax.random.PRNGKey(0))
    # render() stub returns one env's poses
    frame = env.render(state, env_idx=1)
    assert frame["x"].shape == (env.model.nbody, 3)
    assert np.isfinite(frame["quat"]).all()

    rec = FrameRecorder(env, env_idx=0)
    step = jax.jit(env.step)
    for _ in range(4):
        state, obs, rew, done, ex = step(state, jnp.ones((2, env.num_acts)))
        rec.add(state)
    npz = rec.save(str(tmp_path / "replay.npz"))
    data = np.load(npz, allow_pickle=True)
    assert data["x"].shape == (4, env.model.nbody, 3)
    # the cart moved under constant force -> frames differ
    assert not np.allclose(data["x"][0], data["x"][-1])

    out = render_replay(npz, str(tmp_path / "frames"), stride=2)
    assert len(out) == 2
    for p in out:
        assert os.path.getsize(p) > 1000  # a real PNG, not an empty file


def test_export_usd(tmp_path):
    """USD scene/trajectory export (reference export_usd_sim,
    factory_base.py:502): valid usda header, one Xform per body with
    time-sampled poses, geoms as USD geometric prims."""
    from isaacgymenvs_tpu.utils.usd_export import export_replay_usd, export_usd

    env = task_map["Cartpole"]({"env": {"numEnvs": 2}})
    state, obs = env.reset(jax.random.PRNGKey(0))
    rec = FrameRecorder(env, env_idx=0)
    step = jax.jit(env.step)
    for _ in range(3):
        state, obs, rew, done, ex = step(state, jnp.ones((2, env.num_acts)))
        rec.add(state)
    p = export_usd(env.model, rec.frames_x, rec.frames_quat,
                   str(tmp_path / "scene.usda"), dt=env.dt)
    text = open(p).read()
    assert text.startswith("#usda 1.0")
    assert text.count('def Xform "') >= env.model.nbody
    # every body carries 3 time samples
    assert text.count("xformOp:translate.timeSamples") == env.model.nbody
    assert "0: (" in text and "2: (" in text
    # a geometric prim made it out (cartpole: box/capsule geoms)
    assert ('def Cube "' in text) or ('def Capsule "' in text)

    # npz round trip without the Model (sphere approximation)
    npz = rec.save(str(tmp_path / "replay.npz"))
    p2 = export_replay_usd(npz, str(tmp_path / "replay.usda"))
    t2 = open(p2).read()
    assert t2.startswith("#usda 1.0") and 'def Sphere "' in t2
