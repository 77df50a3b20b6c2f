from .llaflow import LLAFlow, LLAFlowRAFT, llaflow, llaflow_raft  # noqa: F401
