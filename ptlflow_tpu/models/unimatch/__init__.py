from .unimatch import (  # noqa: F401
    UniMatch, unimatch, unimatch_sc2, unimatch_sc2_ref6, gmflow_p,
    gmflow_p_sc2, gmflow_p_sc2_ref6)
