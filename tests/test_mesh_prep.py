"""Scan-mesh preparation: STL IO, component extraction, hole counting,
decimation, stats, caste separation (reference
custom_processing/prepare_antscan_data_for_mesh_fitting.py +
antscan_proofread_stats_and_caste_separation.py, minus Blender/scraping)."""

import struct

import numpy as np

from smilify_tpu.utils.mesh_prep import (
    count_holes,
    decimate_vertex_clustering,
    face_size_cov,
    largest_component,
    load_stl,
    mesh_smoothness,
    mesh_stats,
    save_obj,
    separate_by_caste,
)


def _cube(offset=(0, 0, 0), s=1.0):
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float) * s + offset
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]], np.int32)
    return v, f


def _write_binary_stl(path, verts, faces):
    tris = verts[faces]  # (F, 3, 3)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 0))
            for p in t:
                f.write(struct.pack("<3f", *p))
            f.write(struct.pack("<H", 0))


def test_stl_roundtrip_and_components(tmp_path):
    v1, f1 = _cube()
    v2, f2 = _cube(offset=(5, 0, 0), s=0.5)
    # two disconnected cubes, small one second
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 8])
    stl = tmp_path / "two.stl"
    _write_binary_stl(str(stl), verts, faces)

    lv, lf = load_stl(str(stl))
    assert len(lv) == 16 and len(lf) == 24  # welded back to shared vertices

    big_v, big_f = largest_component(lv, lf)
    assert len(big_v) == 8 and len(big_f) == 12
    # hmm — both components have 12 faces; largest by face count picks one
    # whole cube, never a mix
    assert np.ptp(big_v[:, 0]) <= 1.0 + 1e-6


def test_holes_and_stats():
    v, f = _cube()
    assert count_holes(f) == 0
    # remove two non-adjacent faces → still 2 separate boundary loops
    f_open = np.delete(f, [0, 2], axis=0)
    assert count_holes(f_open) == 2

    stats = mesh_stats(v, f)
    assert stats["n_components"] == 1 and stats["n_holes"] == 0
    assert stats["face_size_cov"] == 0.0  # all faces congruent
    assert abs(face_size_cov(v, f)) < 1e-9
    # cube edges bend 90°; plenty of adjacent 0° pairs too
    assert 20.0 < mesh_smoothness(v, f) < 90.0


def test_decimation_bounds_vertices():
    rng = np.random.RandomState(0)
    # dense sphere-ish mesh via jittered grid
    n = 24
    u, w = np.meshgrid(np.linspace(0, np.pi, n), np.linspace(0, 2 * np.pi, n))
    pts = np.stack([np.sin(u) * np.cos(w), np.sin(u) * np.sin(w), np.cos(u)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)

    dv, df = decimate_vertex_clustering(pts, faces, target_vertices=100)
    assert len(dv) <= 100 and len(df) > 20
    # gross shape preserved: radius stays ~1
    r = np.linalg.norm(dv - dv.mean(0), axis=1)
    assert 0.5 < np.median(r) < 1.3


def test_caste_separation_and_cli(tmp_path):
    groups = separate_by_caste(
        ["CASENT_minor_01", "CASENT_major_02", "mystery"],
        {"minor": "minor", "major": "major"},
    )
    assert groups == {"minor": ["CASENT_minor_01"], "major": ["CASENT_major_02"],
                      "unknown": ["mystery"]}

    from smilify_tpu.cli.prepare_meshes import main

    v, f = _cube()
    src = tmp_path / "in"
    src.mkdir()
    _write_binary_stl(str(src / "ant_minor_1.stl"), v, f)
    save_obj(str(src / "ant_major_2.obj"), v, f)
    lookup = tmp_path / "castes.csv"
    lookup.write_text("minor,minor\nmajor,major\n")

    out = tmp_path / "out"
    main([str(src), str(out), "--max-vertices", "8", "--caste-lookup", str(lookup)])
    assert (out / "major" / "ant_major_2.obj").exists()
    assert (out / "minor" / "ant_minor_1.obj").exists()
    assert (out / "stats.csv").exists()
    import csv

    rows = list(csv.DictReader(open(out / "stats.csv")))
    assert len(rows) == 2 and rows[0]["n_holes"] == "0"
