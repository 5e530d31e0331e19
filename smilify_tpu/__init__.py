"""smilify_tpu — a TPU-native (JAX/XLA/Pallas) parametric animal-model fitting and
neural-inference framework with the capabilities of FabianPlum/SMILify.

Subpackages
-----------
core     : SMIL/SMAL model asset format (ModelSpec), rotations, linear blend skinning.
render   : cameras (FoV perspective, OpenCV conversion), Pallas soft rasterizer, Phong.
ops      : TPU-native mesh ops — KNN, chamfer, point sampling, mesh regularizers, SDF.
fitter   : optimization-based fitters (2D keypoint+silhouette fitter, 3D registration).
models   : neural regressors (backbones, IEF transformer decoder, single/multi-view).
data     : host-side data pipeline (HDF5 datasets, replicAnt/SLEAP loaders, augs).
train    : config system, trainers, checkpointing, benchmark harness.
parallel : device-mesh / sharding helpers (data parallelism over ICI).
utils    : export (PLY/npz/AMASS), visualization, monitoring.
"""

__version__ = "0.1.0"

from smilify_tpu.core.spec import ModelSpec, load_model_spec  # noqa: F401
from smilify_tpu.core.lbs import smil_forward  # noqa: F401
