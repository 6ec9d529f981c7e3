from . import box, elements, frame  # noqa: F401
