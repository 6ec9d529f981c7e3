from .render import TachyonRender, CameraParams, preset_camera  # noqa: F401
