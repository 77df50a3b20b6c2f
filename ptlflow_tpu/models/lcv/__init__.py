from .lcv_raft import LCV_RAFT, LCV_RAFTSmall, lcv_raft, lcv_raft_small  # noqa: F401
