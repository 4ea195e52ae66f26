from .droidnet import DroidNet, init_droidnet  # noqa: F401
