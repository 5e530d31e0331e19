"""GT-parameter floor diagnostic for the bundled replicAnt-x-SMIL-TEX set.

Feeds the dataset's own ground-truth SMIL parameters through the exact
training/benchmark forward path (``forward_model`` with the UE world
convention) and reports the *reachable floors* for both benchmark metrics:

  * 2D: mean pixel error of GT-parameter joints projected through the GT
    camera vs the dataset's 2D labels (BENCHMARK.md's 21.3 px number),
  * 3D: MPJPE of GT-parameter joints vs the dataset's labeled 3D keypoints,
    in the benchmark's reported unit (world units × 1000, labeled "mm").

Both floors are owned by the bundled-asset mismatch — the dataset was
generated from a 13-scale/trans-PCA SMIL model absent from the snapshot, with
skeleton proportions that differ from ``SMILy_STICK.pkl`` (see BENCHMARK.md);
the reference's own PCA decode raises on this data
(``Unreal2Pytorch3D.py:143-149``). NOTE the "mm" label: replicAnt worlds use
the UE ×10 convention, so world units are not meters and the absolute MPJPE
numbers are only comparable *within* this dataset (against the floor printed
here), not across datasets.

Usage:  python tools/gt_floor_diag.py  [--dataset PATH] [--model PKL]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset",
                    default="/root/reference/data/replicAnt_trials/replicAnt-x-SMIL-TEX")
    ap.add_argument("--model",
                    default="/root/reference/3D_model_prep/SMILy_STICK.pkl")
    ap.add_argument("--resolution", type=int, default=224)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from smilify_tpu.core.spec import load_model_spec
    from smilify_tpu.data.replicant import ReplicantDataset
    from smilify_tpu.models.regressor import forward_model, project_to_camera

    spec = load_model_spec(args.model, align_symmetry=False)
    ds = ReplicantDataset(args.dataset, spec.joint_names, image_size=args.resolution)

    err3d, err2d = [], []
    for i in range(len(ds)):
        s = ds[i]
        preds = {
            "global_rot": jnp.asarray(s["global_rot"])[None],
            "joint_rot": jnp.asarray(s["joint_rot"])[None],
            "betas": jnp.asarray(s["betas"][: spec.n_betas])[None],
            "trans": jnp.asarray(s["trans"])[None],
            "fov": jnp.asarray(s["fov"]).reshape(1),
            "cam_rot": jnp.asarray(s["cam_rot"]).reshape(1, 3, 3),
            "cam_trans": jnp.asarray(s["cam_trans"])[None],
        }
        _, j3d = forward_model(spec, preds, use_ue_scaling=True)
        err3d.append(np.linalg.norm(np.asarray(j3d[0]) - s["keypoints_3d"], axis=-1))

        kp2d = project_to_camera(preds, j3d, (args.resolution, args.resolution))
        # both sides are normalized (y, x) — the benchmark's add_2d contract
        d = (np.asarray(kp2d[0]) - s["keypoints_2d"]) * args.resolution
        e = np.linalg.norm(d, axis=-1)
        vis = s.get("keypoint_visibility")
        err2d.append(e[vis > 0] if vis is not None else e)

    e3 = np.concatenate(err3d) * 1000.0
    e2 = np.concatenate(err2d)
    out = {
        "n_frames": len(ds),
        "px_floor_mean": float(e2.mean()),
        "mpjpe_floor_mm": float(e3.mean()),
        "mpjpe_floor_p50": float(np.percentile(e3, 50)),
        "mpjpe_floor_p90": float(np.percentile(e3, 90)),
        "note": "floors from GT parameters through the benchmark path; "
                "'mm' = world units x1000 (UE x10 convention, not meters)",
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
