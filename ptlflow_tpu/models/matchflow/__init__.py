from .matchflow import MatchFlow, MatchFlowRAFT, matchflow, matchflow_raft  # noqa: F401
