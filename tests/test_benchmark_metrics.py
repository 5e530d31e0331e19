"""Benchmark harness math: PCK curve, MPJPE percentiles, dual-resolution
errors, report files (reference benchmark_model.py:176-251 output contract)."""

import numpy as np

from smilify_tpu.train.benchmark import BenchmarkAccumulator


def test_pck_exact_values():
    acc = BenchmarkAccumulator()
    # 4 joints at known pixel errors (input_size=100): 0, 3, 7, 30 px
    gt = np.zeros((1, 4, 2))
    pred = np.array([[[0, 0], [0.03, 0], [0, 0.07], [0.18, 0.24]]])  # norm (y, x)
    acc.add_2d(pred, gt, np.ones((1, 4)), input_size=100,
               native_size=np.array([[200.0, 200.0]]))
    c = acc.pck_curve("input")
    assert c[1] == 0.25 and c[5] == 0.5 and c[10] == 0.75 and c[50] == 1.0
    # native resolution doubles the errors: 0, 6, 14, 60 px
    cn = acc.pck_curve("native")
    assert cn[5] == 0.25 and cn[10] == 0.5 and cn[20] == 0.75 and cn[50] == 0.75


def test_visibility_filters_errors():
    acc = BenchmarkAccumulator()
    gt = np.zeros((1, 3, 2))
    pred = np.array([[[0, 0], [1.0, 0], [0, 0]]])  # middle joint 100 px off
    vis = np.array([[1.0, 0.0, 1.0]])              # ...but invisible
    acc.add_2d(pred, gt, vis, input_size=100)
    errs = np.concatenate(acc.pixel_errors_input)
    assert errs.size == 2 and errs.max() < 1e-9


def test_mpjpe_stats_and_report(tmp_path):
    acc = BenchmarkAccumulator()
    pred = np.zeros((10, 5, 3))
    gt = np.zeros((10, 5, 3))
    gt[..., 0] = 0.01  # 10 mm everywhere
    acc.add_3d(pred, gt)
    s = acc.mpjpe_stats()
    np.testing.assert_allclose(s["mpjpe_mm"], 10.0, rtol=1e-6)
    np.testing.assert_allclose(s["p99"], 10.0, rtol=1e-6)
    assert s["n"] == 50

    acc.add_2d(np.zeros((1, 2, 2)), np.zeros((1, 2, 2)), np.ones((1, 2)), 64)
    report = acc.write_report(str(tmp_path))
    assert "PCK@5px" in report and "MPJPE" in report
    assert (tmp_path / "benchmark_report.txt").exists()
    assert (tmp_path / "mpjpe_mm.npy").exists()
    assert (tmp_path / "pck_curve.png").exists()
