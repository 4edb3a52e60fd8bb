from volrt.core.types import Raycaster, View, Volume, make_raycaster  # noqa: F401
