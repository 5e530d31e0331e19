from smilify_tpu.fitter.fitter import FitParams, SmalFitter, FitData  # noqa: F401
from smilify_tpu.fitter.fitter_batch import (  # noqa: F401
    BatchedFitter,
    GridShardedFitter,
    ShardedBatchedFitter,
)
from smilify_tpu.fitter.fitter_frames import ShardedSequenceFitter  # noqa: F401
from smilify_tpu.fitter.progressive import ProgressiveFitter  # noqa: F401
from smilify_tpu.fitter.stages import OPT_WEIGHTS, StageWeights  # noqa: F401
