from .flownet import (  # noqa: F401
    FlowNetS, FlowNetC, FlowNetSD, FlowNetCS, FlowNetCSS, FlowNet2,
    FlowNetFusion,
    flownets, flownetc, flownetsd, flownetcs, flownetcss, flownet2,
)
