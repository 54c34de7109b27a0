"""train.py CLI surface (L7): end-to-end smoke through main().

Reference train.py:71-219 contract: Hydra-style overrides, config
snapshot under runs/<name>/, checkpoint under runs/<name>/nn/, test=True
evaluation from a checkpoint, profile flag."""
import os

import pytest


@pytest.mark.slow
def test_cli_train_then_play(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train as train_mod

    args = [
        "task=Cartpole",
        "num_envs=16",
        "max_iterations=2",
        "pipeline=cpu",
        "headless=True",
        "experiment=CliSmoke",
        "train.params.config.name=CliSmoke",
        "train.params.config.minibatch_size=128",
        "train.params.config.save_frequency=1",
    ]
    train_mod.main(args)
    assert os.path.exists("runs/CliSmoke/config.yaml")
    ckpts = [
        f for f in os.listdir("runs/CliSmoke/nn") if f.endswith(".ckpt")
    ]
    assert ckpts, "training must save a checkpoint"

    # test=True evaluation from the produced checkpoint (play path)
    train_mod.main(
        [
            "task=Cartpole",
            "num_envs=16",
            "pipeline=cpu",
            "test=True",
            f"checkpoint=runs/CliSmoke/nn/{ckpts[0]}",
            "train.params.config.player.games_num=16",
            "train.params.config.player.max_steps=60",
        ]
    )


@pytest.mark.slow
def test_cli_profile_flag(tmp_path, monkeypatch):
    """profile=<dir> captures a jax.profiler trace of the first
    profile_epochs epochs (SURVEY 5.1)."""
    monkeypatch.chdir(tmp_path)
    import train as train_mod

    train_mod.main(
        [
            "task=Cartpole",
            "num_envs=16",
            "max_iterations=3",
            "pipeline=cpu",
            "headless=True",
            "experiment=ProfSmoke",
            "train.params.config.name=ProfSmoke",
            "train.params.config.minibatch_size=128",
            f"profile={tmp_path}/trace",
            "profile_epochs=1",
        ]
    )
    prof = os.path.join(tmp_path, "trace", "plugins", "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


def test_cli_capture_video(tmp_path, monkeypatch):
    """capture_video=True records deterministic-policy replay frames
    during training (reference train.py:132-144 RecordVideo path,
    rendered headlessly via utils.replay)."""
    monkeypatch.chdir(tmp_path)
    import train as train_mod

    train_mod.main(
        [
            "task=Cartpole",
            "num_envs=8",
            "max_iterations=1",
            "pipeline=cpu",
            "headless=True",
            "experiment=VidSmoke",
            "train.params.config.name=VidSmoke",
            "train.params.config.minibatch_size=64",
            "capture_video=True",
            "capture_video_freq=1",
            "capture_video_len=3",
        ]
    )
    vdir = os.path.join("runs", "VidSmoke", "videos", "epoch_1")
    assert os.path.exists(vdir + ".npz"), "replay trajectory must be saved"
    frames = [f for f in os.listdir(vdir) if f.endswith(".png")]
    assert frames, "rendered video frames must exist"
