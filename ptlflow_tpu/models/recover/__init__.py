from .recover import (  # noqa: F401
    FlowAnything, ReCoVEr, flow_anything, recover_cx, recover_mn,
    recover_rn)
