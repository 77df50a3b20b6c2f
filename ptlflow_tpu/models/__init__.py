"""Model zoo imports — importing a family registers its models
(reference: /root/reference/ptlflow/models/__init__.py:1-45)."""

from .raft import raft, raft_small  # noqa: F401
from .gma import gma  # noqa: F401
from .gmflownet import gmflownet, gmflownet_mix  # noqa: F401
from .matchflow import matchflow, matchflow_raft  # noqa: F401
from .scv import scv4, scv8  # noqa: F401
from .separableflow import separableflow  # noqa: F401
from .streamflow import streamflow  # noqa: F401
from .sea_raft import sea_raft, sea_raft_s, sea_raft_m, sea_raft_l  # noqa: F401
from .gmflow import gmflow, gmflow_refine  # noqa: F401
from .pwcnet import pwcnet, pwcnet_nodc  # noqa: F401
from .flowformerplusplus import flowformer_pp  # noqa: F401
from .flownet import (  # noqa: F401
    flownets, flownetc, flownetsd, flownetcs, flownetcss, flownet2,
)
from .skflow import skflow  # noqa: F401
from .craft import craft  # noqa: F401
from .csflow import csflow  # noqa: F401
from .liteflownet import (  # noqa: F401
    liteflownet, liteflownet2, liteflownet2_pseudoreg, liteflownet3,
    liteflownet3_pseudoreg, liteflownet3s, liteflownet3s_pseudoreg,
)
from .neuflow import neuflow  # noqa: F401
from .neuflow2 import neuflow2  # noqa: F401
from .dicl import dicl  # noqa: F401
from .memfof import memfof  # noqa: F401
from .irr import irr_pwc, irr_pwcnet, irr_pwcnet_irr, scopeflow  # noqa: F401
from .starflow import starflow  # noqa: F401
from .llaflow import llaflow, llaflow_raft  # noqa: F401
from .splatflow import splatflow  # noqa: F401
from .dip import dip  # noqa: F401
from .recover import (  # noqa: F401
    flow_anything, recover_cx, recover_mn, recover_rn,
)
from .ms_raft_plus import ms_raft_p  # noqa: F401
from .memflow import memflow, memflow_t  # noqa: F401
from .flowseek import flowseek_t, flowseek_m  # noqa: F401
from .ccmr import ccmr, ccmr_p  # noqa: F401
from .hd3 import hd3, hd3_ctxt  # noqa: F401
from .waft import (  # noqa: F401
    waft_dav2_a1, waft_dav2_a2, waft_dinov3_a2, waft_twins_a2,
)
from .flow1d import flow1d  # noqa: F401
from .fastflownet import fastflownet  # noqa: F401
from .maskflownet import maskflownet, maskflownet_s  # noqa: F401
from .lcv import lcv_raft, lcv_raft_small  # noqa: F401
from .flowformer import flowformer  # noqa: F401
from .rapidflow import (  # noqa: F401
    rapidflow, rapidflow_it1, rapidflow_it2, rapidflow_it3, rapidflow_it6,
)
from .rpknet import rpknet  # noqa: F401
from .dpflow import dpflow  # noqa: F401
from .vcn import vcn, vcn_small  # noqa: F401
from .videoflow import videoflow_bof, videoflow_mof  # noqa: F401
from .unimatch import (  # noqa: F401
    unimatch, unimatch_sc2, unimatch_sc2_ref6, gmflow_p, gmflow_p_sc2,
    gmflow_p_sc2_ref6,
)
