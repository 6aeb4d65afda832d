"""End-to-end integration: synthesize a tiny dataset, train via the CLI
path on the emulated 8-device CPU mesh, assert losses drop and every
artifact of the reference's artifact set appears (SURVEY.md §4 integration
tier)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration-scale; core gate runs -m 'not slow'

from paig_reproduction_tpu.data import generators as g


@pytest.fixture(scope="module")
def tiny_spring_data(tmp_path_factory):
    """A miniature spring_color-layout dataset tree."""
    root = tmp_path_factory.mktemp("datasets")
    # The CLI task table hard-codes seq_len 12 (train) / 30 (test), so the
    # fixture files must carry those real lengths.
    for name, seq in (("color_spring_vx8_vy8_sl12_r2_k4_e6.npz", 12),
                      ("color_spring_vx8_vy8_sl30_r2_k4_e6.npz", 30)):
        g.generate_spring_balls_dataset(
            str(root / "spring_color" / name),
            train_set_size=16, valid_set_size=8, test_set_size=8,
            seq_len=seq, img_size=[32, 32], radius=2, dt=0.3, k=4, equil=6,
            vx0_max=2.0, vy0_max=2.0, color=True, seed=1)
    return str(root)


def test_cli_end_to_end(tiny_spring_data, tmp_path):
    from paig_reproduction_tpu.cli import main

    save_dir = str(tmp_path / "run")
    os.environ["PAIG_VIZ_EXAMPLES"] = "2"
    main([
        "--task=spring_color", "--epochs=3", "--batch_size=8",
        "--save_dir", save_dir, "--base_lr=3e-4", "--optimizer=rmsprop",
        "--autoencoder_loss=3.0", "--color", "--save_every_n_epochs=2",
        "--eval_every_n_epochs=1", "--print_interval=1",
        "--data_dir", tiny_spring_data,
    ])

    # Artifact set parity (reference base.py/physics_models.py)
    for artifact in ("log.txt", "code.zip", "outputs.npz",
                     "extra_outputs.npz", "example0.jpg", "templates.jpg",
                     "animation1.gif"):
        assert os.path.exists(os.path.join(save_dir, artifact)), artifact
    assert os.path.exists(os.path.join(save_dir, "model.ckpt"))

    # log.txt format: k=v lines with the reference metric names
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "train - iter=" in log
    assert "valid - epoch=" in log
    assert "test - epoch=" in log
    assert "eval_pred_loss=" in log

    # outputs.npz layout
    with np.load(os.path.join(save_dir, "outputs.npz")) as d:
        assert "input" in d and "output" in d
        assert d["input"].ndim == 5
        assert d["output"].shape[1] == 3      # (pred, extrap, recons)

    with np.load(os.path.join(save_dir, "extra_outputs.npz")) as d:
        for k in ("contents", "templates", "background_content",
                  "transf_contents", "transf_masks", "enc_masks",
                  "masked_objs"):
            assert k in d, k

    # training reduced the loss: compare first and last train iters
    train_lines = [ln for ln in log.splitlines() if "train - iter=" in ln]
    first = float(train_lines[0].split("train_loss=")[1].split()[0])
    last = float(train_lines[-1].split("train_loss=")[1].split()[0])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_aux_on_recons_trigger(tiny_spring_data, tmp_path):
    """--aux_on_recons holds the extension losses off until valid recons
    crosses the threshold, then flips them on mid-run (no recompile:
    warmup is a traced argument)."""
    from paig_reproduction_tpu.cli import main

    save_dir = str(tmp_path / "trig")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    common = [
        "--task=spring_color", "--epochs=2", "--batch_size=8",
        "--base_lr=3e-4", "--autoencoder_loss=3.0", "--color",
        "--save_every_n_epochs=5", "--eval_every_n_epochs=1",
        "--print_interval=1", "--data_dir", tiny_spring_data, "--debug",
        "--pos_consistency=1.0", "--fit_physics_every=1",
    ]
    # Threshold far above any real recons: triggers at the FIRST eval.
    main(common + ["--save_dir", save_dir, "--aux_on_recons=1e6"])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "aux_on_recons trigger" in log

    # Threshold below any 2-epoch recons: never triggers; the train-time
    # physics fit is held off by the same signal.
    save_dir2 = str(tmp_path / "notrig")
    main(common + ["--save_dir", save_dir2, "--aux_on_recons=1e-6"])
    log2 = open(os.path.join(save_dir2, "log.txt")).read()
    assert "aux_on_recons trigger" not in log2
    # the hook's own log lines all start "fit_physics:"; matching the
    # colon avoids false hits from the argv echo at the top of log.txt
    # (e.g. a pytest invocation naming tests/test_fit_physics.py)
    assert "fit_physics:" not in log2


def test_aux_trigger_survives_resume(tiny_spring_data, tmp_path):
    """A fired --aux_on_recons trigger is checkpointed: resuming keeps
    the aux losses on from step 0 instead of silently re-disarming until
    the next eval."""
    from paig_reproduction_tpu.cli import main

    save_dir = str(tmp_path / "trig_resume")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    common = [
        "--task=spring_color", "--batch_size=8", "--save_dir", save_dir,
        "--base_lr=3e-4", "--autoencoder_loss=3.0", "--color",
        "--save_every_n_epochs=1", "--eval_every_n_epochs=1",
        "--print_interval=1", "--data_dir", tiny_spring_data, "--debug",
        "--pos_consistency=1.0", "--aux_on_recons=1e6",
    ]
    main(common + ["--epochs=1"])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "aux_on_recons trigger:" in log
    main(common + ["--epochs=1", "--use_ckpt"])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "aux_on_recons trigger restored" in log


def test_resume_from_checkpoint(tiny_spring_data, tmp_path):
    """--use_ckpt restores params+opt_state+step (capability superset of
    the reference, which restores params only)."""
    from paig_reproduction_tpu.cli import main

    save_dir = str(tmp_path / "run2")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    common = [
        "--task=spring_color", "--batch_size=8", "--save_dir", save_dir,
        "--base_lr=3e-4", "--autoencoder_loss=3.0", "--color",
        "--save_every_n_epochs=1", "--eval_every_n_epochs=5",
        "--print_interval=1", "--data_dir", tiny_spring_data, "--debug",
    ]
    main(common + ["--epochs=1"])
    assert os.path.exists(os.path.join(save_dir, "model.ckpt"))
    # resume: must not wipe the dir, must load the checkpoint
    main(common + ["--epochs=1", "--use_ckpt"])
    assert os.path.exists(os.path.join(save_dir, "log.txt"))


def test_resume_remaining_epochs(tiny_spring_data, tmp_path):
    """--resume_remaining_epochs finishes the ORIGINAL --epochs schedule
    across a crash/resume chain (the watchdog's exit-75 supervisor path)
    by carrying a cumulative total_epochs_done leaf in the checkpoint."""
    from paig_reproduction_tpu.cli import main
    from paig_reproduction_tpu.train.checkpoint import peek_checkpoint_leaf

    save_dir = str(tmp_path / "runw")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    common = [
        "--task=spring_color", "--batch_size=8", "--save_dir", save_dir,
        "--base_lr=3e-4", "--autoencoder_loss=3.0", "--color",
        "--save_every_n_epochs=1", "--eval_every_n_epochs=5",
        "--print_interval=1", "--data_dir", tiny_spring_data, "--debug",
    ]
    main(common + ["--epochs=2"])          # "crashed" after 2 of 3
    assert int(np.asarray(peek_checkpoint_leaf(
        save_dir, "total_epochs_done"))) == 2
    main(common + ["--epochs=3", "--use_ckpt",
                   "--resume_remaining_epochs"])
    # The resume trained exactly 3-2=1 epoch and the chain total is 3.
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "epochs done, training 1 more" in log
    assert int(np.asarray(peek_checkpoint_leaf(
        save_dir, "total_epochs_done"))) == 3
    # A further resume with the schedule already complete trains the
    # floor of 1 epoch (never 0: the final save must still happen).
    main(common + ["--epochs=3", "--use_ckpt",
                   "--resume_remaining_epochs"])
    assert int(np.asarray(peek_checkpoint_leaf(
        save_dir, "total_epochs_done"))) == 4


def test_auto_rescue_in_training(tiny_spring_data, tmp_path):
    """--auto_rescue: a stalled-discovery eval triggers in-place slot
    surgery (disk templates + pinned median background), freezes the
    background (bg_lr_mult=0 rebuild) and training continues. The
    installed background must survive the remaining epochs EXACTLY
    (frozen), the surgery must be one-shot, and the rescue marker must
    persist in the checkpoint."""
    from paig_reproduction_tpu.cli import main
    from paig_reproduction_tpu.train import surgery
    from paig_reproduction_tpu.train.checkpoint import CKPT_NAME

    save_dir = str(tmp_path / "rescue")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    main([
        "--task=spring_color", "--epochs=3", "--batch_size=8",
        "--save_dir", save_dir, "--base_lr=3e-4", "--optimizer=rmsprop",
        "--autoencoder_loss=3.0", "--color", "--save_every_n_epochs=3",
        "--eval_every_n_epochs=1", "--print_interval=1",
        "--data_dir", tiny_spring_data, "--debug",
        # 2 untrained epochs always sit above recons 3.0 -> fires at ep 1
        "--auto_rescue=1",
    ])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert log.count("auto_rescue: epoch") == 1      # one-shot
    # training continued post-surgery (epochs 2-3 logged train lines
    # after the rescue line)
    rescue_pos = log.index("auto_rescue: epoch")
    assert "train - iter=" in log[rescue_pos:]

    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(save_dir, CKPT_NAME)))
    assert int(np.asarray(restored["rescue_step"])) >= 0
    # Stall-guard context persists (VERDICT r4 §7): the save epoch, the
    # surgery epoch and the (epoch, recons) eval history are in the
    # checkpoint, so a kill/resume keeps its cooldown + descent baseline.
    assert int(np.asarray(restored["epoch"])) == 3
    assert int(np.asarray(restored["rescue_epoch"])) == 1
    hist = np.asarray(restored["recons_history"])
    assert hist.ndim == 2 and hist.shape[1] == 2 and hist.shape[0] >= 3
    # The pinned background is the pixelwise train-split median and is
    # FROZEN: two post-surgery epochs must not have moved it (the
    # bg_lr_mult=0 optimizer branch zeroes its updates).
    bg_logits = surgery.var_net_forward(restored["params"],
                                        "var_net_background")
    bg = 1.0 / (1.0 + np.exp(-bg_logits))
    with np.load(os.path.join(
            tiny_spring_data, "spring_color",
            "color_spring_vx8_vy8_sl12_r2_k4_e6.npz")) as d:
        med = surgery.median_background(d["train_x"])
    np.testing.assert_allclose(bg.reshape(med.shape), med, atol=2e-2)
    # resumed runs restore the marker instead of re-triggering
    main([
        "--task=spring_color", "--epochs=1", "--batch_size=8",
        "--save_dir", save_dir, "--base_lr=3e-4",
        "--autoencoder_loss=3.0", "--color", "--save_every_n_epochs=1",
        "--eval_every_n_epochs=1", "--print_interval=1",
        "--data_dir", tiny_spring_data, "--debug", "--use_ckpt",
        "--auto_rescue=1",
    ])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert "auto_rescue state restored" in log
    assert "auto_rescue stall-guard history restored" in log
    assert log.count("auto_rescue: epoch") == 1


def test_discovery_restarts(tiny_spring_data, tmp_path):
    """--discovery_restarts: N arms train from independent inits, the
    best-valid-recons arm is selected, and the run continues from it for
    the remaining --epochs budget (arm epochs count against the total)."""
    from paig_reproduction_tpu.cli import main

    save_dir = str(tmp_path / "restarts")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    main([
        "--task=spring_color", "--epochs=3", "--batch_size=8",
        "--save_dir", save_dir, "--base_lr=3e-4", "--optimizer=rmsprop",
        "--autoencoder_loss=3.0", "--color", "--save_every_n_epochs=3",
        "--eval_every_n_epochs=1", "--print_interval=1",
        "--data_dir", tiny_spring_data, "--debug",
        "--discovery_restarts=2", "--discovery_epochs=1",
    ])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert log.count("discovery restart arm") == 2
    assert "discovery restarts: continuing from arm" in log
    # Arm scores differ (independent param inits train to different
    # models on this tiny problem).
    import re
    scores = [float(m) for m in re.findall(
        r"discovery restart arm \d+/2: valid recons ([0-9.]+)", log)]
    assert len(scores) == 2 and scores[0] != scores[1]
    # The remaining 2 epochs ran after selection and the final test eval
    # + checkpoint exist.
    sel_pos = log.index("discovery restarts: continuing")
    assert "train - iter=" in log[sel_pos:]
    assert "test - epoch=" in log
    assert os.path.exists(os.path.join(save_dir, "model.ckpt"))


def test_discovery_restarts_early_stop(tiny_spring_data, tmp_path):
    """--discovery_recons_ok: arms stop as soon as one scores under the
    threshold (any untrained-ish recons clears a huge threshold)."""
    from paig_reproduction_tpu.cli import main

    save_dir = str(tmp_path / "restarts_early")
    os.environ["PAIG_VIZ_EXAMPLES"] = "1"
    main([
        "--task=spring_color", "--epochs=2", "--batch_size=8",
        "--save_dir", save_dir, "--base_lr=3e-4", "--optimizer=rmsprop",
        "--autoencoder_loss=3.0", "--color", "--save_every_n_epochs=2",
        "--eval_every_n_epochs=1", "--print_interval=1",
        "--data_dir", tiny_spring_data, "--debug",
        "--discovery_restarts=3", "--discovery_epochs=1",
        "--discovery_recons_ok=1e9",
    ])
    log = open(os.path.join(save_dir, "log.txt")).read()
    assert log.count("discovery restart arm") == 1


def test_auto_rescue_stall_guard():
    """_discovery_stalled: a run still descending >=5% per half-window is
    NOT stalled (late discovery must not be reset); a flat run is."""
    import types
    from paig_reproduction_tpu.train.trainer import Trainer

    ns = types.SimpleNamespace(auto_rescue=250)
    # descending: 8.4 at ep125 -> 5.0 at ep250 (40% improvement)
    ns._recons_history = [(0, 769.0), (125, 8.4), (249, 5.1)]
    assert not Trainer._discovery_stalled(ns, 250, 5.0)
    # flat: 10.5 -> 10.4 over the half-window
    ns._recons_history = [(0, 769.0), (125, 10.5), (249, 10.45)]
    assert Trainer._discovery_stalled(ns, 250, 10.4)
    # no eval far enough back -> legacy behavior (stalled)
    ns._recons_history = [(240, 10.0)]
    assert Trainer._discovery_stalled(ns, 250, 10.0)
