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
