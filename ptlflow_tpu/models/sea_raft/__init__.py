from .sea_raft import (  # noqa: F401
    SEARAFT, SEARAFT_S, SEARAFT_M, SEARAFT_L,
    sea_raft, sea_raft_s, sea_raft_m, sea_raft_l,
)
