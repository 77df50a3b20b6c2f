from .videoflow import (  # noqa: F401
    VideoFlowBOF, VideoFlowMOF, videoflow_bof, videoflow_mof)
