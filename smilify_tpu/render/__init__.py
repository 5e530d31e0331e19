from smilify_tpu.render.cameras import FoVCamera, default_camera  # noqa: F401
