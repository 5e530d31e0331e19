from smilify_tpu.core.spec import ModelSpec, load_model_spec  # noqa: F401
from smilify_tpu.core.lbs import smil_forward, batch_rodrigues, global_rigid_transformation  # noqa: F401
