"""Serving-chain integration: train → run_inference (render + video + AMASS
export + smoothing) → benchmark_model, on a synthetic multi-view dataset with
the micro model (reference §3.4/§3.5 call stacks)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_multiview_serving_chain(tmp_path, stick_spec):
    from smilify_tpu.data.synthetic import generate_synthetic_multiview

    h5 = str(tmp_path / "mv.h5")
    generate_synthetic_multiview(stick_spec, h5, n_samples=6, n_views=2,
                                 resolution=48, render_images=False)

    from smilify_tpu.cli.train_multiview import main as train

    run = tmp_path / "run"
    train(["--model", "/root/reference/3D_model_prep/SMILy_STICK.pkl",
           "--data-path", h5, "--epochs", "1", "--output-dir", str(run),
           "--set", "model.backbone_name=unet_micro", "training.batch_size=2",
           "dataset.dataset_fraction=1.0", "model.transformer_depth=1",
           "model.transformer_heads=2", "model.freeze_backbone=false",
           "multiview.num_views_to_use=2", "multiview.cross_attention_heads=2",
           "multiview.cross_attention_layers=1", "training.use_gt_camera_init=false",
           "output.generate_visualizations_every=100",
           "output.save_checkpoint_every=1"])
    assert (run / "final_model").exists()

    from smilify_tpu.cli.run_inference import main as infer

    rdir = tmp_path / "render"
    infer(["--checkpoint", str(run / "final_model"), "--data-path", h5,
           "--max-frames", "2", "--smooth-window", "3",
           "--export-animation", str(tmp_path / "anim.npz"),
           "--render-dir", str(rdir), "--video", str(rdir / "out.mp4")])
    assert (tmp_path / "anim.npz").exists()
    assert (rdir / "frame_00000.png").exists()
    assert (rdir / "out.mp4").exists()
    assert (rdir / "out_view0.mp4").exists()  # per-view videos (mv contract)
    anim = np.load(tmp_path / "anim.npz")
    assert "poses" in anim or "trans" in anim or len(anim.files) > 0

    from smilify_tpu.cli.benchmark_model import main as benchmark

    benchmark(["--checkpoint", str(run / "final_model"), "--dataset-path", h5,
               "--max-samples", "2", "--output-dir", str(tmp_path / "bench")])
    report = tmp_path / "bench"
    assert any(p.name.startswith("benchmark") or p.suffix in (".txt", ".png", ".npy")
               for p in report.rglob("*")), list(report.rglob("*"))


@pytest.mark.slow
def test_singleview_serving_chain(tmp_path):
    """Single-view: train on the bundled replicAnt images, then run_inference
    through the batched uint8 render path — n=10 frames with chunk C=8
    exercises the clamped-tail chunk (frames 8-9 + 6 clamped duplicates)."""
    from smilify_tpu.cli.train_regressor import main as train

    run = tmp_path / "run"
    train(["--model", "/root/reference/3D_model_prep/SMILy_STICK.pkl",
           "--data-path",
           "/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX",
           "--epochs", "1", "--output-dir", str(run),
           "--set", "model.backbone_name=unet_micro",
           "model.input_resolution=48", "training.batch_size=4",
           "dataset.dataset_fraction=0.5", "model.transformer_depth=1",
           "model.transformer_heads=2", "model.freeze_backbone=false",
           "output.generate_visualizations_every=100",
           "output.save_checkpoint_every=1"])
    assert (run / "final_model").exists()

    from smilify_tpu.cli.run_inference import main as infer

    rdir = tmp_path / "render"
    infer(["--checkpoint", str(run / "final_model"),
           "--data-path",
           "/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX",
           "--max-frames", "10",
           "--render-dir", str(rdir), "--video", str(rdir / "out.mp4")])
    pngs = sorted(rdir.glob("frame_*.png"))
    assert len(pngs) == 10, pngs
    assert (rdir / "out.mp4").exists()
    import imageio.v2 as imageio

    img = imageio.imread(pngs[-1])
    assert img.shape[-1] == 3 and img.dtype == np.uint8
    assert img.std() > 0  # a real render, not a constant buffer
