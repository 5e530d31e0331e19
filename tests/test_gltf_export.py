"""glTF animation export: structural validity + skinning parity.

The strong gate here is *independent re-evaluation*: a small numpy glTF
evaluator parses the written ``.glb`` (no exporter code reused beyond the
container parser), composes node transforms per keyframe, applies glTF
skinning (``skinMatrix = G_joint @ inverseBindMatrix``) and morph targets,
and the reconstructed vertices must match ``smil_forward`` — the same parity
bar the Blender round trip of the reference would have to clear
(SMIL_processing_addon.py:3442 import + :3697 glTF export).
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from smilify_tpu.core.lbs import smil_forward
from smilify_tpu.utils.gltf_export import (
    export_animation_gltf,
    load_glb,
    read_accessor,
)

RNG = np.random.default_rng(11)
TOL = 3e-4  # f32 FK chains on both sides


# --------------------------------------------------------------------------- evaluator


def _quat_to_matrix(q):
    """glTF (x, y, z, w) quaternion → 3x3 rotation."""
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def eval_glb_frame(gltf, blob, frame):
    """Reconstruct world-space skinned vertices at keyframe `frame`."""
    anim = gltf["animations"][0]
    # per-node animated properties at this keyframe
    animated = {}
    morph_weights = None
    for ch in anim["channels"]:
        samp = anim["samplers"][ch["sampler"]]
        out = read_accessor(gltf, blob, samp["output"])
        node_id = ch["target"]["node"]
        path = ch["target"]["path"]
        times = read_accessor(gltf, blob, samp["input"])
        F = times.shape[0]
        if path == "weights":
            morph_weights = out.reshape(F, -1)[frame]
        else:
            animated.setdefault(node_id, {})[path] = out.reshape(F, -1)[frame]

    # compose local TRS → world transforms by scene traversal
    nodes = gltf["nodes"]
    world = [None] * len(nodes)

    def local(nid):
        props = animated.get(nid, {})
        T = np.eye(4)
        t = props.get("translation", nodes[nid].get("translation", [0, 0, 0]))
        r = props.get("rotation", nodes[nid].get("rotation", [0, 0, 0, 1]))
        s = props.get("scale", nodes[nid].get("scale", [1, 1, 1]))
        M = _quat_to_matrix(np.asarray(r, np.float64)) * np.asarray(s, np.float64)[None, :]
        T[:3, :3] = M
        T[:3, 3] = np.asarray(t, np.float64)
        return T

    def visit(nid, parent_world):
        world[nid] = parent_world @ local(nid)
        for c in nodes[nid].get("children", []):
            visit(c, world[nid])

    for root in gltf["scenes"][gltf["scene"]]["nodes"]:
        visit(root, np.eye(4))

    # skinned mesh
    mesh_node = next(i for i, n in enumerate(nodes) if "mesh" in n)
    mesh = gltf["meshes"][nodes[mesh_node]["mesh"]]
    prim = mesh["primitives"][0]
    pos = read_accessor(gltf, blob, prim["attributes"]["POSITION"]).astype(np.float64)
    if "targets" in prim:
        weights = morph_weights if morph_weights is not None else np.asarray(mesh["weights"])
        for k, tgt in enumerate(prim["targets"]):
            pos = pos + weights[k] * read_accessor(gltf, blob, tgt["POSITION"]).astype(np.float64)
    jid = read_accessor(gltf, blob, prim["attributes"]["JOINTS_0"]).astype(np.int64)
    jw = read_accessor(gltf, blob, prim["attributes"]["WEIGHTS_0"]).astype(np.float64)

    skin = gltf["skins"][nodes[mesh_node]["skin"]]
    ibm = read_accessor(gltf, blob, skin["inverseBindMatrices"]).astype(np.float64)
    # glTF matrices are column-major
    ibm = ibm.reshape(-1, 4, 4).transpose(0, 2, 1)
    joint_mats = np.stack(
        [world[j] @ ibm[k] for k, j in enumerate(skin["joints"])]
    )  # (J, 4, 4)

    V = pos.shape[0]
    homo = np.concatenate([pos, np.ones((V, 1))], axis=1)  # (V, 4)
    skinned = np.zeros((V, 3))
    for k in range(4):
        M = joint_mats[jid[:, k]]  # (V, 4, 4)
        skinned += jw[:, k : k + 1] * np.einsum("vab,vb->va", M[:, :3], homo)
    return skinned


def _forward_verts(spec, theta, trans, betas, log_scales=None, joint_trans=None):
    """Reference vertices from the jax forward (posedirs are zero on the
    bundled models, so no corrective mismatch)."""
    import jax.numpy as jnp

    F = theta.shape[0]
    out = smil_forward(
        spec,
        jnp.asarray(np.broadcast_to(betas, (F, betas.shape[-1]))),
        jnp.asarray(theta),
        trans=jnp.asarray(trans),
        log_scales=jnp.asarray(log_scales) if log_scales is not None else None,
        joint_trans=jnp.asarray(joint_trans) if joint_trans is not None else None,
    )
    return np.asarray(out.verts)


def _random_anim(spec, F=4, scale_mag=0.0, jtrans_mag=0.0, betas_pf=False):
    J, B = spec.n_joints, spec.n_betas
    poses = RNG.normal(0, 0.15, (F, 3 + 3 * (J - 1))).astype(np.float32)
    trans = RNG.normal(0, 0.3, (F, 3)).astype(np.float32)
    data = {
        "poses": poses,
        "trans": trans,
        "betas": RNG.normal(0, 0.3, B).astype(np.float32),
        "mocap_framerate": np.float32(24.0),
    }
    if scale_mag:
        ls = RNG.normal(0, scale_mag, (F, J, 3)).astype(np.float32)
        ls[:, 0] = 0.0  # unit root scale: the exactly-representable case
        data["log_beta_scales"] = ls
    if jtrans_mag:
        jt = RNG.normal(0, jtrans_mag, (F, J, 3)).astype(np.float32)
        data["betas_trans"] = jt
    if betas_pf:
        data["betas_per_frame"] = RNG.normal(0, 0.3, (F, B)).astype(np.float32)
    return data


def _theta_trans(data, J):
    F = data["poses"].shape[0]
    theta = np.concatenate(
        [data["poses"][:, :3].reshape(F, 1, 3), data["poses"][:, 3:].reshape(F, J - 1, 3)],
        axis=1,
    )
    return theta, data["trans"]


# --------------------------------------------------------------------------- tests


def test_glb_container_structure(stick_spec, tmp_path):
    data = _random_anim(stick_spec, F=3)
    out = export_animation_gltf(stick_spec, data, str(tmp_path / "clip.glb"))
    gltf, blob = load_glb(out)

    assert gltf["asset"]["version"] == "2.0"
    assert len(gltf["skins"][0]["joints"]) == stick_spec.n_joints
    # every accessor stays within the binary chunk
    for acc in gltf["accessors"]:
        view = gltf["bufferViews"][acc["bufferView"]]
        assert view.get("byteOffset", 0) + view["byteLength"] <= len(blob)
        assert view.get("byteOffset", 0) % 4 == 0
    # POSITION carries required bounds
    pos_acc = gltf["accessors"][gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
    assert "min" in pos_acc and "max" in pos_acc
    # joint names survive
    names = [gltf["nodes"][j]["name"] for j in gltf["skins"][0]["joints"]]
    assert names == list(stick_spec.joint_names)
    # indices reconstruct the face list
    idx = read_accessor(gltf, blob, gltf["meshes"][0]["primitives"][0]["indices"])
    assert np.array_equal(idx.reshape(-1, 3), np.asarray(stick_spec.faces))


def test_hierarchy_parity_rotations_and_root_motion(stick_spec, tmp_path):
    data = _random_anim(stick_spec, F=4)
    out = export_animation_gltf(stick_spec, data, str(tmp_path / "clip.glb"))
    gltf, blob = load_glb(out)
    assert gltf["extras"]["smilify_tpu"]["mode"] == "hierarchy"

    theta, trans = _theta_trans(data, stick_spec.n_joints)
    want = _forward_verts(stick_spec, theta, trans, data["betas"])
    for f in range(theta.shape[0]):
        got = eval_glb_frame(gltf, blob, f)
        assert np.abs(got - want[f]).max() < TOL


def test_hierarchy_parity_joint_translations(mouse_spec, tmp_path):
    """Per-joint translation offsets (betas_trans, Unreal y-flip) keyframe as
    local node translations."""
    data = _random_anim(mouse_spec, F=3, jtrans_mag=0.02)
    out = export_animation_gltf(mouse_spec, data, str(tmp_path / "clip.glb"))
    gltf, blob = load_glb(out)
    assert gltf["extras"]["smilify_tpu"]["mode"] == "hierarchy"

    theta, trans = _theta_trans(data, mouse_spec.n_joints)
    want = _forward_verts(
        mouse_spec, theta, trans, data["betas"], joint_trans=data["betas_trans"]
    )
    for f in range(theta.shape[0]):
        got = eval_glb_frame(gltf, blob, f)
        assert np.abs(got - want[f]).max() < TOL


def test_flat_mode_exact_under_joint_scales(mouse_spec, tmp_path):
    """Scale-cancel FK globals are R·diag(s): the flat layout reproduces the
    forward exactly even though no TRS hierarchy could."""
    data = _random_anim(mouse_spec, F=3, scale_mag=0.1, jtrans_mag=0.01)
    out = export_animation_gltf(mouse_spec, data, str(tmp_path / "clip.glb"))
    gltf, blob = load_glb(out)
    assert gltf["extras"]["smilify_tpu"]["mode"] == "flat"
    assert gltf["extras"]["smilify_tpu"]["max_shear_residual"] < 1e-6

    theta, trans = _theta_trans(data, mouse_spec.n_joints)
    want = _forward_verts(
        mouse_spec, theta, trans, data["betas"],
        log_scales=data["log_beta_scales"], joint_trans=data["betas_trans"],
    )
    for f in range(theta.shape[0]):
        got = eval_glb_frame(gltf, blob, f)
        assert np.abs(got - want[f]).max() < TOL


def test_hierarchy_mode_refuses_scales(mouse_spec, tmp_path):
    data = _random_anim(mouse_spec, F=2, scale_mag=0.1)
    with pytest.raises(ValueError, match="scale-cancel"):
        export_animation_gltf(
            mouse_spec, data, str(tmp_path / "x.glb"), mode="hierarchy"
        )


def test_morph_targets_animate_per_frame_betas(mouse_spec, tmp_path):
    """Static-joint model + betas_per_frame → shape components become morph
    targets with keyframed weights (the addon's per-frame shape-key path)."""
    data = _random_anim(mouse_spec, F=3, betas_pf=True)
    out = export_animation_gltf(mouse_spec, data, str(tmp_path / "clip.glb"))
    gltf, blob = load_glb(out)
    assert gltf["extras"]["smilify_tpu"]["animate_shape"] is True
    prim = gltf["meshes"][0]["primitives"][0]
    assert len(prim["targets"]) == mouse_spec.n_betas

    theta, trans = _theta_trans(data, mouse_spec.n_joints)
    import jax.numpy as jnp

    out_fwd = smil_forward(
        mouse_spec,
        jnp.asarray(data["betas_per_frame"]),
        jnp.asarray(theta),
        trans=jnp.asarray(trans),
    )
    want = np.asarray(out_fwd.verts)
    for f in range(theta.shape[0]):
        got = eval_glb_frame(gltf, blob, f)
        assert np.abs(got - want[f]).max() < TOL


def test_nonstatic_model_falls_back_to_averaged_betas(stick_spec, tmp_path):
    """Joint-regressing models cannot morph shape without invalidating the
    bind skeleton — mirror the addon's forced static_shape."""
    data = _random_anim(stick_spec, F=2, betas_pf=True)
    with pytest.warns(UserWarning, match="clip-averaged"):
        out = export_animation_gltf(stick_spec, data, str(tmp_path / "clip.glb"))
    gltf, blob = load_glb(out)
    assert gltf["extras"]["smilify_tpu"]["animate_shape"] is False

    theta, trans = _theta_trans(data, stick_spec.n_joints)
    avg = data["betas_per_frame"].mean(axis=0)
    want = _forward_verts(stick_spec, theta, trans, avg)
    got = eval_glb_frame(gltf, blob, 0)
    assert np.abs(got - want[0]).max() < TOL


def test_cli_roundtrip(tmp_path):
    """recorder npz → CLI → parseable glb with the right frame count."""
    from smilify_tpu.utils.animation_export import AnimationRecorder

    rec = AnimationRecorder(model_name="stick", fps=12.0)
    J = 55
    for _ in range(3):
        rec.add_frame(
            RNG.normal(0, 0.1, 3),
            RNG.normal(0, 0.1, (J - 1, 3)),
            RNG.normal(0, 0.1, 3),
            betas=RNG.normal(0, 0.2, 20).astype(np.float32),
        )
    npz = rec.export(str(tmp_path / "clip"))

    out = str(tmp_path / "clip.glb")
    res = subprocess.run(
        [
            sys.executable, "-m", "smilify_tpu.cli.export_gltf",
            "--model", "/root/reference/3D_model_prep/SMILy_STICK.pkl",
            "--animation", npz, "--out", out,
        ],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORM_NAME": "cpu"},
    )
    assert res.returncode == 0, res.stderr
    gltf, blob = load_glb(out)
    times = read_accessor(
        gltf, blob, gltf["animations"][0]["samplers"][0]["input"]
    )
    assert times.shape[0] == 3
    assert abs(times[1] - 1.0 / 12.0) < 1e-6
    assert gltf["extras"]["smilify_tpu"]["fps"] == 12.0


def test_rest_pose_export(stick_spec, tmp_path):
    """--rest-pose exports the skinned model with no animation file (the
    glTF analog of the addon's plain Export SMIL Model)."""
    from smilify_tpu.cli.export_gltf import main as export_main

    out = str(tmp_path / "rest.glb")
    export_main([
        "--model", "/root/reference/3D_model_prep/SMILy_STICK.pkl",
        "--rest-pose", "--out", out,
    ])
    gltf, blob = load_glb(out)
    pos = read_accessor(
        gltf, blob, gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]
    )
    assert np.allclose(pos, np.asarray(stick_spec.v_template), atol=1e-6)
    assert gltf["extras"]["smilify_tpu"]["num_frames"] == 1
    assert len(gltf["skins"][0]["joints"]) == stick_spec.n_joints


def test_recorder_exports_betas_per_frame(tmp_path):
    """Varying per-frame betas land in the npz under the reference's
    betas_per_frame key; constant betas stay out (AMASS compatibility)."""
    from smilify_tpu.utils.animation_export import AnimationRecorder, load_animation

    for varying in (False, True):
        rec = AnimationRecorder()
        b0 = np.zeros(5, np.float32)
        for i in range(3):
            rec.add_frame(
                np.zeros(3), np.zeros((4, 3)), np.zeros(3),
                betas=b0 + (0.1 * i if varying else 0.0),
            )
        npz = rec.export(str(tmp_path / f"v{varying}"))
        data, _ = load_animation(npz)
        assert ("betas_per_frame" in data) == varying
        if varying:
            assert data["betas_per_frame"].shape == (3, 5)
