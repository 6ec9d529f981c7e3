from . import load_save  # noqa: F401
