"""Smoke coverage for the utility CLIs that have no other test reference:
dataset_viewer, generate_video, plot_pca_data, preprocess_replicant,
preprocess_replicant_multiview, read_fitter_stages, sdf_batch,
show_latest_checkpoint, train_pointnet. Each runs in-process on tiny
bundled/synthetic inputs and asserts its real output artifact."""

import glob
import os
import pickle
import shutil
import subprocess

import numpy as np
import pytest

TEX = "/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX"
STICK = "/root/reference/3D_model_prep/SMILy_STICK.pkl"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# preprocessors + dataset viewer (chained: raw replicAnt → HDF5 → HTML report)
# ---------------------------------------------------------------------------


def test_preprocess_replicant_then_viewer(tmp_path):
    from smilify_tpu.cli.preprocess_replicant import main as preprocess

    h5 = str(tmp_path / "sv.h5")
    preprocess(["--input", TEX, "--output", h5, "--model", STICK,
                "--resolution", "64"])
    assert os.path.exists(h5)

    import h5py

    with h5py.File(h5, "r") as f:
        n = f["metadata"].attrs["num_samples"]
        assert n >= 4
        assert "images" in f and "keypoints" in f

    from smilify_tpu.cli.dataset_viewer import main as viewer

    out = str(tmp_path / "report")
    viewer(["--dataset", h5, "--output", out, "--samples", "2"])
    index = os.path.join(out, "index.html")
    assert os.path.exists(index)
    assert os.path.exists(os.path.join(out, "sample_0.png"))
    with open(index) as f:
        assert "samples" in f.read()


def test_preprocess_replicant_multiview_cli(tmp_path):
    """Two synchronized 'cameras' built from the bundled frames → mv HDF5."""
    trial = tmp_path / "trial"
    for cam in ("cam_a", "cam_b"):
        d = trial / cam
        d.mkdir(parents=True)
        for i in ("00", "01"):
            for ext in (".json", ".JPG"):
                shutil.copy(os.path.join(TEX, f"replicAnt-x-SMIL-TEX_{i}{ext}"),
                            d / f"replicAnt-x-SMIL-TEX_{i}{ext}")
        shutil.copy(os.path.join(TEX, "_BatchData_replicAnt-x-SMIL-TEX.json"),
                    d / f"_BatchData_{cam}.json")

    from smilify_tpu.cli.preprocess_replicant_multiview import main

    h5 = str(tmp_path / "mv.h5")
    main(["--input", str(trial), "--output", h5, "--model", STICK,
          "--resolution", "64", "--min-views", "2"])
    assert os.path.exists(h5)

    from smilify_tpu.data.hdf5_dataset import MultiViewHDF5Dataset

    ds = MultiViewHDF5Dataset(h5)
    assert len(ds) == 2
    s = ds[0]
    assert s["images"].shape[0] == 2          # two views
    assert bool(s["view_mask"].all())


# ---------------------------------------------------------------------------
# fitter-output tooling
# ---------------------------------------------------------------------------


def _fake_fitter_run(run_dir, spec, n_frames=2, with_pkl=True):
    """checkpoints/<run>/<frame>/st10_ep0.{png,pkl} as ImageExporter writes."""
    import imageio.v2 as imageio

    P = spec.n_joints - 1
    for i in range(n_frames):
        d = os.path.join(run_dir, f"{i:04d}")
        os.makedirs(d, exist_ok=True)
        imageio.imwrite(os.path.join(d, "st10_ep0.png"),
                        np.full((16, 16, 3), 30 * (i + 1), np.uint8))
        if with_pkl:
            params = {
                "global_rotation": np.zeros(3, np.float32),
                "joint_rotations": np.zeros((P, 3), np.float32),
                "betas": np.asarray(spec.shape_mean_betas, np.float32),
                "trans": np.asarray([0.0, 0.0, 0.0], np.float32),
                "fov": np.asarray([60.0], np.float32),
            }
            with open(os.path.join(d, "st10_ep0.pkl"), "wb") as f:
                pickle.dump(params, f)


def test_generate_video_render_and_collage(tmp_path, stick_spec):
    from smilify_tpu.cli.generate_video import main

    run = str(tmp_path / "run")
    _fake_fitter_run(run, stick_spec)

    out = main(["--checkpoint-dir", run, "--model", STICK,
                "--epoch-name", "st10_ep0", "--size", "64",
                "--output", str(tmp_path / "render.mp4")])
    assert os.path.exists(out) and os.path.getsize(out) > 0

    out2 = main(["--checkpoint-dir", run, "--model", STICK,
                 "--epoch-name", "st10_ep0", "--collage",
                 "--output", str(tmp_path / "collage.mp4")])
    assert os.path.exists(out2) and os.path.getsize(out2) > 0


def test_show_latest_checkpoint_cli(tmp_path, stick_spec, capsys):
    from smilify_tpu.cli.show_latest_checkpoint import main

    root = tmp_path / "checkpoints"
    _fake_fitter_run(str(root / "older_run"), stick_spec, with_pkl=False)
    _fake_fitter_run(str(root / "newer_run"), stick_spec, with_pkl=False)
    os.utime(str(root / "newer_run"))

    dest = str(tmp_path / "copied")
    main(["--root", str(root), "--copy-to", dest])
    out = capsys.readouterr().out
    assert "newer_run" in out
    assert len(glob.glob(os.path.join(dest, "*.png"))) == 2


def test_read_fitter_stages_cli(tmp_path, stick_spec, capsys):
    from smilify_tpu.cli.read_fitter_stages import main

    V = stick_spec.v_template.shape[0]
    npz = str(tmp_path / "Stage2.npz")
    np.savez(
        npz,
        labels=np.asarray(["scan_a", "scan_b"]),
        verts=np.tile(np.asarray(stick_spec.v_template, np.float32)[None], (2, 1, 1)),
        faces=np.asarray(stick_spec.faces),
        betas=np.zeros((2, stick_spec.n_betas), np.float32),
        trans=np.zeros((2, 3), np.float32),
        global_rot=np.zeros((2, 3), np.float32),
        deform_verts=np.zeros((2, V, 3), np.float32),
    )
    out_dir = str(tmp_path / "objs")
    main(["--npz", npz, "--export-obj", out_dir])
    assert "2 fitted meshes" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out_dir, "scan_a.obj"))
    assert os.path.exists(os.path.join(out_dir, "scan_b.obj"))


# ---------------------------------------------------------------------------
# SDF batch CLI on a tiny analytic mesh
# ---------------------------------------------------------------------------

CUBE_VERTS = np.array(
    [[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0) for z in (0.0, 1.0)],
    np.float32,
)
CUBE_FACES = np.array(
    [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
     [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
    np.int32,
)


def test_sdf_batch_cli(tmp_path):
    from smilify_tpu.utils.export import save_obj
    from smilify_tpu.cli.sdf_batch import main

    mesh_dir = str(tmp_path / "meshes")
    os.makedirs(mesh_dir)
    save_obj(os.path.join(mesh_dir, "cube.obj"), CUBE_VERTS, CUBE_FACES)

    out = main(["--mesh_dir", mesh_dir, "--num-samples", "64",
                "--num-rays", "8", "--smooth-k", "16", "--assign-k", "4"])
    with open(out, "rb") as f:
        results = pickle.load(f)
    r = results["cube"]
    assert r["vertex_sdf"].shape == (8,)
    assert np.all(np.isfinite(r["vertex_sdf"]))
    # a unit cube's interior diameters are O(1), not degenerate
    assert 0.1 < float(np.median(r["sample_sdf"])) < 3.0


# ---------------------------------------------------------------------------
# PCA plotting CLI (exercises the native C++ loader through ctypes)
# ---------------------------------------------------------------------------


def test_plot_pca_data_cli(tmp_path):
    native = os.path.join(REPO, "native")
    try:
        subprocess.run(["make", "-C", native], check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        pytest.skip(f"native smil_tools unavailable: {exc}")

    from smilify_tpu.utils.smil_tools_native import export_pca_csv

    rng = np.random.RandomState(0)
    bones = [f"bone_{i}" for i in range(5)]
    csv = str(tmp_path / "pca.csv")
    export_pca_csv(csv, bones, rng.randn(5, 3, 3).astype(np.float32),
                   rng.randn(5, 3, 3).astype(np.float32))

    from smilify_tpu.cli.plot_pca_data import main

    out = str(tmp_path / "plots")
    main(["--csv", csv, "--out", out, "--components", "2"])
    assert os.path.exists(os.path.join(out, "pc_1.png"))
    assert os.path.exists(os.path.join(out, "pc_2.png"))


# ---------------------------------------------------------------------------
# PointNet training CLI (tiny self-supervised run)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_train_pointnet_cli(tmp_path):
    from smilify_tpu.cli.train_pointnet import main

    out = str(tmp_path / "run")
    main(["--model", STICK, "--arch", "pointnet", "--epochs", "1",
          "--steps-per-epoch", "2", "--batch", "2", "--points", "128",
          "--output-dir", out])
    assert os.path.exists(os.path.join(out, "final_model.meta.json")) or \
        len(glob.glob(os.path.join(out, "*"))) > 0
