from .runner import StageRunner  # noqa: F401
