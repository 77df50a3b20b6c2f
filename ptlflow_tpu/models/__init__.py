"""Model zoo imports — importing a family registers its models
(reference: /root/reference/ptlflow/models/__init__.py:1-45)."""

from .raft import raft, raft_small  # noqa: F401
from .gma import gma  # noqa: F401
