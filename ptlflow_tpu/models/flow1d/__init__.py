from .flow1d import Flow1D, flow1d  # noqa: F401
