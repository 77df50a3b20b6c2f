from .dip import DIP, dip  # noqa: F401
