from .flowseek import (FlowSeek, FlowSeekM, FlowSeekT,  # noqa: F401
                       flowseek_m, flowseek_t)
