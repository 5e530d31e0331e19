"""Scatter plots of PCA morph-data CSVs — equivalent of the reference root
``plot_pca_data.py``: visualize the per-bone scale/translation principal
components exported by the authoring tools (the replicAnt plugin's CSV schema).

Usage:
  python -m smilify_tpu.cli.plot_pca_data --csv pca.csv [--out plots/]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--out", default="pca_plots")
    ap.add_argument("--components", type=int, default=None, help="first N PCs to plot")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from smilify_tpu.utils.smil_tools_native import PCAMorphData

    d = PCAMorphData(args.csv)
    os.makedirs(args.out, exist_ok=True)
    C = min(args.components or d.num_components, d.num_components)
    xs = np.arange(d.num_bones)

    for c in range(C):
        fig, axes = plt.subplots(2, 1, figsize=(max(8, d.num_bones * 0.35), 6), sharex=True)
        for ax, data, title in (
            (axes[0], d.scaledirs[:, :, c], f"PC_{c+1} scale"),
            (axes[1], d.transdirs[:, :, c], f"PC_{c+1} translation"),
        ):
            for i, lbl in enumerate("xyz"):
                ax.scatter(xs, data[:, i], s=14, label=lbl)
            ax.axhline(0, color="gray", lw=0.5)
            ax.set_title(title)
            ax.legend(loc="upper right", fontsize=8)
        axes[1].set_xticks(xs)
        axes[1].set_xticklabels(d.bone_names, rotation=90, fontsize=7)
        fig.tight_layout()
        path = os.path.join(args.out, f"pc_{c+1}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print(f"→ {path}")


if __name__ == "__main__":
    main()
