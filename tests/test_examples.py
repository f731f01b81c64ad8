"""Smoke-run every example driver (the notebook-replacement surface,
SURVEY.md §1 L6) on synthetic data at tiny shapes, each in a clean CPU
subprocess, so the six entry points can't rot silently."""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(tmp_path, script, *args, timeout=420):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = REPO  # clean CPU jax: no sitecustomize platform pin
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *map(str, args)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")
    return proc.stdout


def test_train_segmentation_whole(tmp_path):
    out = _run(tmp_path, "train_segmentation.py", "--synthetic",
               "--epochs", 1, "--img-size", 16, "--ocfl", 4,
               "--batch-size", 4, "--weights-stem", "smoke")
    assert "Epoch 1" in out
    assert (tmp_path / "weights" / "smoke_epoch_1.ckpt").exists()


def test_train_segmentation_packed_resilient(tmp_path):
    out = _run(tmp_path, "train_segmentation.py", "--synthetic", "--packed",
               "--resilient", "--epochs", 1, "--img-size", 16, "--ocfl", 4,
               "--batch-size", 4, "--weights-stem", "smokep")
    assert "mean DSC" in out
    assert (tmp_path / "weights" / "smokep_epoch_1.ckpt").exists()


def test_train_segmentation_packed_bf16(tmp_path):
    out = _run(tmp_path, "train_segmentation.py", "--synthetic", "--packed",
               "--bf16", "--epochs", 1, "--img-size", 16, "--ocfl", 4,
               "--batch-size", 4, "--weights-stem", "smokeb")
    assert "mean DSC" in out
    assert (tmp_path / "weights" / "smokeb_epoch_1.ckpt").exists()


def test_train_segmentation_patches(tmp_path):
    out = _run(tmp_path, "train_segmentation.py", "--synthetic", "--patches",
               "--epochs", 1, "--img-size", 16, "--ocfl", 4,
               "--weights-stem", "smoke")
    assert "Epoch 1" in out


def test_train_ae(tmp_path):
    out = _run(tmp_path, "train_ae.py", "--synthetic", "--epochs", 1)
    assert "loss" in out.lower() or "epoch" in out.lower()


def test_train_fader(tmp_path):
    out = _run(tmp_path, "train_fader.py", "--synthetic", "--epochs", 1,
               "--img-size", 12, "--batch-size", 4, "--disc-loop", 1)
    assert "val accuracy" in out


def test_classification_cv(tmp_path):
    out = _run(tmp_path, "classification_cv.py", "--synthetic",
               "--model", "voxresnet", "--batch-size", 4)
    assert "CV ROC-AUC" in out


def _save_nifti(path, data):
    sys.path.insert(0, REPO)
    from mri_epilepsy_diagnosis_tpu.utils.nifti import save_nifti
    save_nifti(str(path), data.astype(np.float32), np.eye(4))


def test_detection_pipeline(tmp_path):
    # synthetic subject: centered gray-matter slab, lesion inside it
    shape = (96, 96, 6)
    gmpm = np.zeros(shape, np.float32)
    gmpm[12:84, 12:84, :] = 1.0
    rng = np.random.default_rng(0)
    img = rng.random(shape).astype(np.float32) * gmpm
    mask = np.zeros(shape, np.float32)
    mask[30:50, 20:40, 2:5] = 1.0
    _save_nifti(tmp_path / "gmpm.nii.gz", gmpm)
    _save_nifti(tmp_path / "img.nii.gz", img)
    _save_nifti(tmp_path / "mask.nii.gz", mask)

    out = _run(tmp_path, "detection_pipeline.py",
               "--gmpm", tmp_path / "gmpm.nii.gz",
               "--image", tmp_path / "img.nii.gz",
               "--mask", tmp_path / "mask.nii.gz",
               "--epochs", 1, "--out", tmp_path / "pred.nii.gz")
    assert "predicted mask voxels" in out
    assert (tmp_path / "pred.nii.gz").exists()


@requires_reference
def test_infer_whole_brain(tmp_path):
    rng = np.random.default_rng(1)
    _save_nifti(tmp_path / "t1.nii.gz",
                rng.random((64, 64, 64)).astype(np.float32))
    pth = ("/root/reference/segmentation/weights/"
           "whole_im_train_seg_parc_epoch_7.pth")
    out = _run(tmp_path, "infer_whole_brain.py", "--pth", pth,
               "--image", tmp_path / "t1.nii.gz", "--img-size", 16,
               "--coord-min", 4, 4, 4, "--out", tmp_path / "pred.nii.gz")
    assert "foreground voxels" in out
    assert (tmp_path / "pred.nii.gz").exists()


@requires_reference
def test_validate_checkpoints(tmp_path):
    out = _run(tmp_path, "validate_checkpoints.py", "--synthetic",
               "--img-size", 16, "--ocfl", 8, "--n-synthetic", 2,
               "--pattern", "whole_im_train_seg_parc_epoch_7.pth")
    assert "whole_im_train_seg_parc_epoch_7.pth" in out
    assert "best:" in out
    # the sweep reports all three reference metrics per checkpoint
    assert "DSC" in out and "ASD" in out and "IoU" in out
