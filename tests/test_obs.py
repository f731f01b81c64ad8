"""Observability: JSONL logger (comet-compatible), step timer, viz."""
import json

import numpy as np

from mri_epilepsy_diagnosis_tpu.obs import Experiment, JsonlLogger, StepTimer
from mri_epilepsy_diagnosis_tpu.utils.viz_tools import (plot_central_cuts,
                                                        plot_difference,
                                                        plot_predicted)


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = JsonlLogger(path)
    log.set_name("exp1")
    log.log_metric("train_dice_loss", 0.5)
    log.log_metrics({"mean_val_loss": 0.4, "val_metric": 0.9}, epoch=3)
    log.log_epoch_end(3)
    log.close()
    records = [json.loads(l) for l in open(path)]
    assert records[0]["metric"] == "train_dice_loss"
    assert records[0]["experiment"] == "exp1"
    assert records[1]["metrics"]["val_metric"] == 0.9
    assert records[2]["event"] == "epoch_end"


def test_experiment_factory(tmp_path):
    exp = Experiment(project_name="seg", log_dir=str(tmp_path))
    exp.log_metric("x", 1.0)
    exp.close()
    assert list(tmp_path.iterdir())


def test_step_timer():
    import jax.numpy as jnp

    t = StepTimer()
    for _ in range(3):
        t.start()
        x = jnp.ones((8, 8)) * 2
        t.stop(x)
    assert len(t.times) == 3 and t.total >= t.mean > 0


def test_viz_tools(tmp_path, rng):
    img = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
    seg = (rng.random((1, 16, 16, 16)) > 0.5).astype(np.float32)
    plot_central_cuts(img, save_path=str(tmp_path / "a.png"))
    plot_predicted(img, seg, save_path=str(tmp_path / "b.png"))
    plot_difference(img, seg, save_path=str(tmp_path / "c.png"))
    assert len(list(tmp_path.iterdir())) == 3


def test_training_dashboard_redraws(tmp_path):
    """Per-epoch dashboard (the reference's clear_output+plt.show loop,
    utils/routine.py:80-97) writes an updated figure every update."""
    from mri_epilepsy_diagnosis_tpu.obs import TrainingDashboard

    out = tmp_path / "dash.png"
    d = TrainingDashboard(metric_name="roc_auc", out_path=str(out))
    d.update(train_loss=1.0, val_loss=1.2, train_metric=0.5, val_metric=0.45)
    assert out.exists()
    size1 = out.stat().st_size
    d.update(train_loss=0.8, val_loss=1.0, train_metric=0.6, val_metric=0.55)
    assert out.stat().st_size > 0 and len(d.train_loss) == 2
    assert size1 > 1000  # a real figure, not an empty file


def test_fader_dashboard_from_history(tmp_path):
    from mri_epilepsy_diagnosis_tpu.obs import FaderDashboard, moving_average
    import numpy as np

    hist = {k: list(np.random.default_rng(0).random(30) + 0.1)
            for k in ["train_loss", "train_loss_disc", "train_loss_adv",
                      "val_loss", "val_loss_disc", "acc_train", "roc_train",
                      "acc_domain_train", "acc", "roc", "acc_domain"]}
    hist["roc"][3] = float("nan")  # single-class epochs produce NaN
    out = tmp_path / "fader.png"
    FaderDashboard(out_path=str(out)).update(hist)
    assert out.exists() and out.stat().st_size > 1000

    ma = moving_average([1.0, 2.0, 3.0, 4.0], w=2)
    np.testing.assert_allclose(ma, [1.0, 1.5, 2.5, 3.5])


def test_dashboard_wired_into_train_loop(tmp_path):
    """train() calls dashboard.update once per epoch."""
    from mri_epilepsy_diagnosis_tpu.train.classification import train
    from mri_epilepsy_diagnosis_tpu.train.state import create_train_state
    from mri_epilepsy_diagnosis_tpu.train.optim import torch_adam
    from mri_epilepsy_diagnosis_tpu.models import PatchModel
    from sklearn.metrics import accuracy_score
    import jax
    import jax.numpy as jnp
    import numpy as np

    class Recorder:
        def __init__(self):
            self.calls = []

        def update(self, **kw):
            self.calls.append(kw)

    rng = np.random.default_rng(0)
    batches = [(rng.normal(size=(4, 16, 32, 2)).astype(np.float32),
                np.array([0, 1, 0, 1])) for _ in range(2)]
    state = create_train_state(PatchModel(), torch_adam(1e-3),
                               jnp.zeros((1, 16, 32, 2)), jax.random.key(0))
    rec = Recorder()
    train(state, batches, None, lambda t, p: accuracy_score(
        t, [x > 0.5 for x in p]), max_epoch=2, eps=0.0, dashboard=rec)
    assert len(rec.calls) == 2
    assert "train_loss" in rec.calls[0]
