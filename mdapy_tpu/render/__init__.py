from .render import TachyonRender, CameraParams, preset_camera  # noqa: F401
from .distributed import (  # noqa: F401
    make_mesh,
    render_image_sharded,
    render_train_step,
)
